"""Coordinate-transform contracts, mirroring reference test semantics
(test/tests.py:483-509 round-trip + fixed-point tests)."""

import numpy as np

from unmixing_ray import geo

GT = (321675.0, 30.0, 0.0, 4701465.0, 0.0, -30.0)


def test_pixel_to_xy_exact():
    # Core math must equal px*gt[1]+gt[0], py*gt[5]+gt[3] (utils.py:930-931)
    out = geo.pixel_to_xy([(0, 0), (10, 10)], GT)
    assert out[0] == (321675.0, 4701465.0)
    assert out[1] == (321675.0 + 300.0, 4701465.0 - 300.0)


def test_xy_to_pixel_truncation():
    # int() truncation toward zero (utils.py:1153-1155)
    out = geo.xy_to_pixel([(321675.0 + 299.0, 4701465.0 - 299.0)], GT)
    assert out == [(9, 9)]


def test_round_trip_within_one_pixel():
    rng = np.random.default_rng(42)
    pairs = [(int(a), int(b)) for a, b in rng.integers(1, 70, size=(50, 2))]
    xy = geo.pixel_to_xy(pairs, GT)
    back = geo.xy_to_pixel(xy, GT)
    for (x0, y0), (x1, y1) in zip(pairs, back):
        assert abs(x0 - x1) <= 1 and abs(y0 - y1) <= 1


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(1)
    px = rng.integers(-5, 100, 64)
    py = rng.integers(-5, 100, 64)
    xs, ys = geo.pixel_to_xy_arrays(px, py, GT)
    scalar = geo.pixel_to_xy(list(zip(px.tolist(), py.tolist())), GT)
    assert np.allclose(xs, [s[0] for s in scalar])
    assert np.allclose(ys, [s[1] for s in scalar])
    bx, by = geo.xy_to_pixel_arrays(xs + 7.0, ys - 7.0, GT)
    scalar2 = geo.xy_to_pixel(
        [(x + 7.0, y - 7.0) for x, y in scalar], GT)
    assert bx.tolist() == [s[0] for s in scalar2]
    assert by.tolist() == [s[1] for s in scalar2]


def test_tile_geotransform():
    tgt = geo.tile_geotransform(GT, 32, 64)
    assert tgt == (321675.0 + 32 * 30.0, 30.0, 0.0,
                   4701465.0 - 64 * 30.0, 0.0, -30.0)


def test_point_to_pixel_geometry():
    polys = geo.point_to_pixel_geometry([(100.0, 200.0)], 30)
    assert len(polys) == 1
    ring = polys[0]
    assert ring[0] == (85.0, 215.0)
    assert ring[-1] == ring[0]
    assert len(ring) == 5


def test_pixel_to_geojson():
    import json
    doc = json.loads(geo.pixel_to_geojson([(0, 0)], GT))
    assert doc["type"] == "GeometryCollection"
    assert doc["geometries"][0]["coordinates"] == [321675.0, 4701465.0]

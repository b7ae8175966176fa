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


# ---------------------------------------------------------------------------
# dd (decimal-degree) reprojection: self-contained transverse Mercator
# (reference analogue: utils.py:913-937 / 1129-1143, test/tests.py:483-509)

def test_dd_projection_invariants():
    import numpy as np
    from unmixing_ray import proj
    # quarter meridian matches the published WGS84 constant to < 1 mm
    assert abs(proj._meridian_arc(np.pi / 2) - 10001965.7293) < 1e-3
    # central meridian x equator maps to (FE, 0) exactly
    x, y = proj.dd_to_projected(proj.DEFAULT_LON0, 0.0)
    assert float(x) == 500000.0 and float(y) == 0.0
    # east-west symmetry about the central meridian
    e1, n1 = proj.dd_to_projected(proj.DEFAULT_LON0 + 1.0, 40.0)
    e2, n2 = proj.dd_to_projected(proj.DEFAULT_LON0 - 1.0, 40.0)
    assert abs((float(e1) - 500000.0) + (float(e2) - 500000.0)) < 1e-6
    assert abs(float(n1) - float(n2)) < 1e-6


def test_dd_roundtrip_property():
    import numpy as np
    from unmixing_ray import proj
    rng = np.random.default_rng(7)
    lon = rng.uniform(-84, -78, 500)
    lat = rng.uniform(0.5, 84, 500)
    x, y = proj.dd_to_projected(lon, lat)
    lon2, lat2 = proj.projected_to_dd(x, y)
    assert np.abs(lon2 - lon).max() < 1e-7
    assert np.abs(lat2 - lat).max() < 1e-7
    x2, y2 = proj.dd_to_projected(lon2, lat2)
    assert np.abs(x2 - x).max() < 1e-2
    assert np.abs(y2 - y).max() < 1e-2


def test_pixel_to_xy_dd_mode():
    """pixel -> projected -> dd -> pixel closes (the reference's
    test_pixel_to_geographic_coords / inverse pin, tests.py:483-509)."""
    (lon, lat), = geo.pixel_to_xy([(10, 20)], GT, dd=True)
    assert -85 < lon < -78 and 0 < lat < 84
    (px, py), = geo.xy_to_pixel([(lon, lat)], GT, dd=True)
    # truncation may land on the pixel edge: allow the int() boundary
    assert px in (9, 10) and py in (19, 20)
    # interior probe closes exactly
    (lon_c, lat_c), = geo.pixel_to_xy([(10.5, 20.5)], GT, dd=True)
    (px2, py2), = geo.xy_to_pixel([(lon_c, lat_c)], GT, dd=True)
    assert (px2, py2) == (10, 20)


def test_get_coord_transform_factory():
    """Reference utils.py:657-673 analogue: factory returns callables
    both ways; round-trip closes; unknown pairs raise."""
    import numpy as np
    import pytest as _pytest
    from unmixing_ray import proj
    fwd = proj.get_coord_transform(proj.WGS84, proj.ENGINE_CRS)
    inv = proj.get_coord_transform(proj.ENGINE_CRS, proj.WGS84)
    x, y = fwd(-80.5, 42.0)
    lon, lat = inv(x, y)
    assert abs(float(lon) + 80.5) < 1e-7 and abs(float(lat) - 42.0) < 1e-7
    ident = proj.get_coord_transform(proj.ENGINE_CRS, proj.ENGINE_CRS)
    assert ident(3.0, 4.0) == (3.0, 4.0)
    with _pytest.raises(ValueError, match="no transform"):
        proj.get_coord_transform("EPSG:3857", proj.ENGINE_CRS)

"""Property-based tests (hypothesis) for the bit-exact contracts."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from unmixing_ray import cellindex as ci
from unmixing_ray import codecs, geo
from unmixing_ray.kernels import nnls

GT = st.tuples(
    st.floats(-1e6, 1e6), st.floats(0.1, 1000.0), st.just(0.0),
    st.floats(-1e6, 1e7), st.just(0.0), st.floats(-1000.0, -0.1))


@given(GT, st.lists(st.tuples(st.integers(0, 5000),
                              st.integers(0, 5000)), min_size=1,
                    max_size=20))
@settings(max_examples=50, deadline=None)
def test_pixel_xy_roundtrip_within_one(gt, pairs):
    xy = geo.pixel_to_xy(pairs, gt)
    back = geo.xy_to_pixel(xy, gt)
    for (x0, y0), (x1, y1) in zip(pairs, back):
        assert abs(x0 - x1) <= 1 and abs(y0 - y1) <= 1


@given(st.integers(0, 28), st.data())
@settings(max_examples=50, deadline=None)
def test_cell_roundtrip(level, data):
    n = 2 ** level
    ix = data.draw(st.integers(0, n - 1))
    iy = data.draw(st.integers(0, n - 1))
    c = ci.cell_from_ixiy(np.uint64(ix), np.uint64(iy), level)
    jx, jy, lv = ci.cell_to_ixiy(c)
    assert (int(jx), int(jy), int(lv)) == (ix, iy, level)
    # bounds contain the center
    cx, cy = ci.cell_center(c)
    c2 = ci.cell_of_xy(np.float64(cx), np.float64(cy), level)
    assert int(np.asarray(c2)) == int(np.asarray(c))


@given(st.integers(1, 4), st.integers(2, 16), st.integers(2, 16),
       st.integers(0, 2 ** 31 - 1))
@settings(max_examples=30, deadline=None)
def test_lossless_codec_roundtrip(bands, h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(-9999, 10000, size=(bands, h, w)).astype(np.int16)
    for fmt in ("raw", "zraw", "tiff"):
        buf = codecs.encode_image(arr, fmt)
        assert np.array_equal(codecs.decode_image(buf, fmt, w, h), arr)


@given(st.integers(0, 2 ** 31 - 1), st.integers(1, 200))
@settings(max_examples=30, deadline=None)
def test_fcls_invariants(seed, c):
    rng = np.random.default_rng(seed)
    U = rng.normal(0, 5, size=(3, 2))
    if abs(np.linalg.det(np.hstack([np.ones((3, 1)), U]))) < 1e-6:
        return  # degenerate simplex
    X = rng.normal(0, 5, size=(c, 2))
    out = nnls.fcls_pixels(X, U)
    assert (out >= -1e-9).all()
    assert np.allclose(out.sum(axis=1), 1.0, atol=1e-6)
    # batching invariance
    if c > 3:
        split = np.vstack([nnls.fcls_pixels(X[: c // 2], U),
                           nnls.fcls_pixels(X[c // 2:], U)])
        assert np.array_equal(out, split)


@given(st.integers(1, 5), st.integers(3, 12), st.integers(3, 12),
       st.data())
@settings(max_examples=40, deadline=None)
def test_chebyshev_distance_matches_bruteforce(radius, h, w, data):
    """Chamfer-iterated saturated distance == brute-force min over all
    obstacle pixels, saturated at radius+1."""
    from unmixing_ray.stages.morphology import chebyshev_distance_u
    obstacle = np.array(
        data.draw(st.lists(st.booleans(), min_size=h * w,
                           max_size=h * w))).reshape(h, w)
    got = chebyshev_distance_u(obstacle, radius)
    ys, xs = np.nonzero(obstacle)
    exp = np.full((h, w), radius + 1, dtype=np.int64)
    for i in range(h):
        for j in range(w):
            if len(ys):
                d = np.maximum(np.abs(ys - i), np.abs(xs - j)).min()
                exp[i, j] = min(d, radius + 1)
    assert (got == exp).all()


@given(st.integers(2, 6), st.integers(4, 32), st.data())
@settings(max_examples=40, deadline=None)
def test_build_lut_matches_naive(levels_pow, bins, data):
    """LUT == the textbook cdf-min equalization formula, and is a
    valid monotone map into [0, levels-1]."""
    from unmixing_ray.stages.enhance import build_lut
    levels = 2 ** levels_pow
    h = np.array(data.draw(st.lists(st.integers(0, 1000), min_size=bins,
                                    max_size=bins)), dtype=np.int64)
    lut = build_lut(h[None, :], levels=levels)[0]
    nz = np.flatnonzero(h)
    if not len(nz) or h.sum() == h[nz[0]]:
        assert (lut == 0).all()
        return
    cdf = np.cumsum(h)
    cdf_min = cdf[nz[0]]
    for b in range(bins):
        exp = (cdf[b] - cdf_min) * (levels - 1) // (cdf[-1] - cdf_min)
        assert lut[b] == max(exp, 0) if b >= nz[0] else lut[b] == 0
    assert (np.diff(lut) >= 0).all()
    assert lut[nz[0]] == 0 and lut[nz[-1]] == levels - 1


@given(st.lists(st.tuples(st.integers(0, 2000), st.integers(0, 2000)),
                min_size=3, max_size=8), st.data())
@settings(max_examples=40, deadline=None)
def test_polygon_metrics_shoelace_general(pts, data):
    """polygon_metrics' doubled-integer shoelace == float shoelace on
    arbitrary (possibly self-intersecting) closed rings with
    .5-quantized coords — the engine contract is |2A| in x8 units."""
    import pandas as pd
    from unmixing_ray.stages.join import polygon_metrics

    ring = [[x + 0.5, y + 0.5] for x, y in pts]
    ring.append(ring[0])
    df = pd.DataFrame({"poly_id": ["p0"], "ring": [ring],
                       "cells": [[1, 2, 3]]})

    class FakeDS:
        def map_batches(self, fn, batch_format):
            return fn(df)

    out = polygon_metrics(FakeDS())
    xs = np.array([p[0] for p in ring])
    ys = np.array([p[1] for p in ring])
    shoe2 = float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
    assert out["area_x8"].iloc[0] == int(round(abs(shoe2) * 4))
    per = float(np.sum(np.abs(np.diff(xs)) + np.abs(np.diff(ys))))
    assert out["perim_x2"].iloc[0] == int(round(per * 2))
    assert out["n_vertices"].iloc[0] == len(pts)
    assert out["n_cells"].iloc[0] == 3

"""Focal majority filter and D8 flow direction via the halo exchange:
the distributed per-tile result must equal a brute-force PER-PIXEL
single-machine reference (independent of the vectorized kernels),
including the exact tie rules and image-border window shrinkage."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from tests.test_focal import _tiles_table
from unmixing_ray.stages.focal import (
    classify_band0, focal_class_counts, focal_majority_tiles)
from unmixing_ray.stages.terrain import d8_flow, flow_direction_tiles

_D8_REF = ((0, 1, 1, False), (1, 1, 2, True), (1, 0, 4, False),
           (1, -1, 8, True), (0, -1, 16, False), (-1, -1, 32, True),
           (-1, 0, 64, False), (-1, 1, 128, True))


def _mode_ref(c):
    """Brute-force per-pixel 3x3 mode, smallest-value tiebreak."""
    H, W = c.shape
    out = np.zeros((H, W), np.int64)
    for i in range(H):
        for j in range(W):
            vals = [c[i + di, j + dj]
                    for di in (-1, 0, 1) for dj in (-1, 0, 1)
                    if 0 <= i + di < H and 0 <= j + dj < W]
            uniq, cnt = np.unique(vals, return_counts=True)
            out[i, j] = uniq[np.argmax(cnt)]  # first max = smallest
    return out


def _flow_ref(z):
    """Brute-force per-pixel D8 with Fraction-free exact slopes."""
    from fractions import Fraction
    H, W = z.shape
    out = np.zeros((H, W), np.int64)
    for i in range(H):
        for j in range(W):
            best = Fraction(0)
            code = 0
            for dr, dc, cd, diag in _D8_REF:
                ni, nj = i + dr, j + dc
                if not (0 <= ni < H and 0 <= nj < W):
                    continue
                d = int(z[i, j]) - int(z[ni, nj])
                if d <= 0:
                    continue
                # slope^2 = d^2 / (1 or 2): exact rational comparison
                s = Fraction(d * d, 2 if diag else 1)
                if s > best:
                    best, code = s, cd
            out[i, j] = code
    return out


@pytest.fixture(scope="module")
def images(ray_session):
    rng = np.random.default_rng(11)
    return {
        # low-cardinality values -> heavy mode ties; 2x3 tile lattice
        "imA": rng.integers(0, 4000, size=(2, 16, 24)).astype(np.int16),
        # single-tile image (all windows shrink at borders)
        "imB": rng.integers(0, 4000, size=(1, 8, 8)).astype(np.int16),
        # flat plateau regions -> pits/flats and slope ties
        "imC": (rng.integers(0, 4, size=(1, 16, 16)) * 700)
        .astype(np.int16),
    }


def test_focal_majority_matches_per_pixel_reference(images):
    tiles = ray.data.from_arrow(_tiles_table(images, 8))
    got = focal_class_counts(focal_majority_tiles(tiles)).to_pandas()
    want = {"tile_id": [], "cls": [], "n": []}
    for img, arr in images.items():
        c = np.clip(arr[0].astype(np.int64) // 800, 0, 7)
        mode = _mode_ref(c)
        H, W = c.shape
        for ty in range(H // 8):
            for tx in range(W // 8):
                blk = mode[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8]
                uniq, cnt = np.unique(blk, return_counts=True)
                want["tile_id"].extend(
                    ["%s_t%d_%d" % (img, ty, tx)] * len(uniq))
                want["cls"].extend(uniq)
                want["n"].extend(cnt)
    want = pd.DataFrame(want).astype({"cls": "int64", "n": "int64"})
    key = ["tile_id", "cls"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key + ["n"]], want[key + ["n"]])


def test_flow_direction_matches_per_pixel_reference(images):
    tiles = ray.data.from_arrow(_tiles_table(images, 8))
    got = flow_direction_tiles(tiles).to_pandas()
    want = {"tile_id": [], "code": [], "n": []}
    for img, arr in images.items():
        codes = _flow_ref(arr[0].astype(np.int64))
        H, W = codes.shape
        for ty in range(H // 8):
            for tx in range(W // 8):
                blk = codes[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8]
                uniq, cnt = np.unique(blk, return_counts=True)
                want["tile_id"].extend(
                    ["%s_t%d_%d" % (img, ty, tx)] * len(uniq))
                want["code"].extend(uniq)
                want["n"].extend(cnt)
    want = pd.DataFrame(want).astype({"code": "int64", "n": "int64"})
    key = ["tile_id", "code"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key + ["n"]], want[key + ["n"]])


def test_d8_kernel_tie_and_border_rules():
    """Hand-built DEM pinning precedence ties and the border rule."""
    # center higher than E and S by the same drop -> E (code 1) wins
    dem = np.zeros((3 + 2, 3 + 2), np.int64)
    valid = np.zeros_like(dem)
    z = np.array([[5, 5, 5], [5, 9, 5], [5, 5, 5]], np.int64)
    dem[1:4, 1:4] = z
    valid[1:4, 1:4] = 1
    codes = d8_flow(dem, valid)
    assert codes[1, 1] == 1          # E beats S/W/N/diagonals on tie
    # cardinal drop d vs diagonal drop d: cardinal steeper (2d^2>d^2)
    z2 = np.array([[9, 9, 9], [9, 9, 4], [9, 9, 4]], np.int64)
    dem2 = np.zeros((5, 5), np.int64)
    valid2 = np.zeros_like(dem2)
    dem2[1:4, 1:4] = z2
    valid2[1:4, 1:4] = 1
    assert d8_flow(dem2, valid2)[1, 1] == 1   # E (cardinal), not SE
    # diagonal must win when its drop is big enough: 2*2^2 < 3^2
    z3 = np.array([[9, 9, 9], [9, 9, 7], [9, 9, 6]], np.int64)
    dem3 = np.zeros((5, 5), np.int64)
    valid3 = np.zeros_like(dem3)
    dem3[1:4, 1:4] = z3
    valid3[1:4, 1:4] = 1
    assert d8_flow(dem3, valid3)[1, 1] == 2   # SE
    # flat -> 0 everywhere
    flat = np.zeros((5, 5), np.int64)
    fv = np.zeros_like(flat)
    flat[1:4, 1:4] = 7
    fv[1:4, 1:4] = 1
    assert (d8_flow(flat, fv) == 0).all()


def test_classify_band0_payload_shape(ray_session):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 8000, size=(3, 8, 8)).astype(np.int16)
    tiles = ray.data.from_arrow(_tiles_table({"im": arr}, 8))
    out = classify_band0(tiles).to_pandas()
    assert (out["bands"] == 1).all()
    c = np.frombuffer(out["pixels"].iloc[0], np.int16)
    expect = np.clip(arr[0].astype(np.int64) // 800, 0, 7)
    assert (c.reshape(8, 8) == expect).all()

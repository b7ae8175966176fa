"""Marching-squares contour tiles: the distributed halo-exchange result
must equal a full-image single-machine reference, including tiles whose
cells straddle tile borders and image borders."""

import numpy as np
import pytest

import ray.data

from unmixing_ray.stages.contour import (SEGS_PER_CASE, W_CYCLE,
                                         cell_cases, contour_tiles)

from test_focal import _tiles_table


def _full_image_contour(arr, T, threshold):
    """Per-tile reference computed on the full image."""
    z = arr[0].astype(np.int64)
    H, W = z.shape
    b = (z >= threshold).astype(np.int64)
    case = (b[:-1, :-1] + 2 * b[:-1, 1:]
            + 4 * b[1:, :-1] + 8 * b[1:, 1:])
    segs = SEGS_PER_CASE[case]
    ay, ax = np.mgrid[0:H - 1, 0:W - 1]
    wts = ((ay % T) * T + (ax % T)) % W_CYCLE + 1
    out = {}
    for ty in range((H + T - 1) // T):
        for tx in range((W + T - 1) // T):
            rs = slice(ty * T, min((ty + 1) * T, H - 1))
            cs = slice(tx * T, min((tx + 1) * T, W - 1))
            c = case[rs, cs]
            out[(ty, tx)] = (int(c.size), int(segs[rs, cs].sum()),
                             int((c * wts[rs, cs]).sum()))
    return out


@pytest.mark.parametrize("seed,hw", [(1, (64, 64)), (2, (96, 64)),
                                     (3, (64, 128))])
def test_contour_matches_full_image(ray_session, seed, hw):
    T = 32
    rng = np.random.default_rng(seed)
    H, W = hw
    arr = rng.integers(0, 5000, (3, H, W)).astype(np.int16)
    want = _full_image_contour(arr, T, 2500)
    ds = ray.data.from_arrow(_tiles_table({"imgC": arr}, T))\
        .repartition(4)
    got = contour_tiles(ds, threshold=2500).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        ty, tx = (int(x) for x in r["tile_id"].split("_t")[1].split("_"))
        assert (int(r["n_cells"]), int(r["n_segments"]),
                int(r["case_checksum"])) == want[(ty, tx)], r["tile_id"]


def test_cell_cases_saddles_and_borders():
    # hand-built 3x3 plane: checkerboard above/below threshold
    dem = np.array([[3, 1, 3], [1, 3, 1], [3, 1, 3]], dtype=np.int64)
    valid = np.ones((3, 3), dtype=np.int64)
    case, ok = cell_cases(dem, valid, threshold=2)
    # every 2x2 cell is a saddle (TL+BR or TR+BL above threshold)
    assert ok.all()
    assert set(np.unique(case)) <= {6, 9}
    assert (SEGS_PER_CASE[case] == 2).all()
    # invalidate one corner: the two cells touching it drop out
    valid[0, 0] = 0
    _, ok2 = cell_cases(dem, valid, threshold=2)
    assert ok2[0, 0] == 0 and ok2.sum() == 3


def test_composite_percentile_matches_brute(ray_session):
    """Order-statistic composite over a synthetic date stack ==
    per-pixel sorted-index brute force, including NODATA holes and
    sub-block key re-chunking, at two partitionings."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from unmixing_ray.cellindex import cell_from_ixiy
    from unmixing_ray.stages.trend import SUBT, composite_percentile

    rng = np.random.default_rng(13)
    n_dates, T = 9, 32
    stack = rng.integers(0, 4000, (n_dates, T, T)).astype(np.int16)
    stack[:, 2, 3] = -9999          # a never-valid pixel
    stack[0:5, 10, 10] = -9999      # partially valid pixel
    cell = cell_from_ixiy(np.array([7]), np.array([9]), 12)[0]
    rows = []
    for d in range(n_dates):
        rows.append({
            "cell": int(cell), "row_off": 0, "col_off": 0,
            "h": T, "w": T, "bands": 1,
            "pixels": np.ascontiguousarray(stack[d]).tobytes()})
    t = pa.table({
        "cell": pa.array([r["cell"] for r in rows], pa.uint64()),
        "row_off": pa.array([r["row_off"] for r in rows], pa.int32()),
        "col_off": pa.array([r["col_off"] for r in rows], pa.int32()),
        "h": pa.array([r["h"] for r in rows], pa.int32()),
        "w": pa.array([r["w"] for r in rows], pa.int32()),
        "bands": pa.array([r["bands"] for r in rows], pa.int32()),
        "pixels": pa.array([r["pixels"] for r in rows], pa.binary())})
    # brute force per pixel
    want_q = np.zeros((T, T), np.int64)
    want_hole = np.zeros((T, T), np.int64)
    for y in range(T):
        for x in range(T):
            v = stack[:, y, x].astype(np.int64)
            v = np.sort(v[v != -9999])
            if len(v):
                want_q[y, x] = v[(len(v) - 1) * 1 // 4]
            else:
                want_hole[y, x] = 1
    for parts in (1, 4):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = composite_percentile(ds, q_num=1, q_den=4).to_pandas()
        assert len(got) == (T // SUBT) ** 2
        assert (got["n_dates"] == n_dates).all()
        for _, r in got.iterrows():
            sy, sx = int(r["row_off"]), int(r["col_off"])
            assert int(r["q_sum"]) == int(
                want_q[sy:sy + SUBT, sx:sx + SUBT].sum()), (sy, sx)
            assert int(r["n_hole"]) == int(
                want_hole[sy:sy + SUBT, sx:sx + SUBT].sum())

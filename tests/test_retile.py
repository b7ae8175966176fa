"""Retiling (re-chunk the raster tile grid): the assembled parent
tiles must equal a direct re-tiling of the full image byte-for-byte,
including ragged edges and batching invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from unmixing_ray.stages.retile import retile, retile_band0_summary


def _images(seed=9):
    rng = np.random.default_rng(seed)
    # divisible, ragged-right, ragged-both, single-tile
    shapes = ((3, 32, 32), (2, 16, 24), (1, 20, 28), (2, 8, 8))
    return {"im%d" % i: rng.integers(-200, 4000, s).astype(np.int16)
            for i, s in enumerate(shapes)}


def _tiles_table(images, T):
    """Ragged-aware tiler (unlike test_focal's, which needs H,W
    divisible by T): border tiles are emitted at their true h x w."""
    rows = {k: [] for k in ("tile_id", "image_id", "cell", "row_off",
                            "col_off", "h", "w", "bands", "pixels")}
    for img, arr in images.items():
        p, H, W = arr.shape
        for ty in range(-(-H // T)):
            for tx in range(-(-W // T)):
                r0, c0 = ty * T, tx * T
                h, w = min(T, H - r0), min(T, W - c0)
                blk = arr[:, r0:r0 + h, c0:c0 + w]
                rows["tile_id"].append("%s_t%d_%d" % (img, ty, tx))
                rows["image_id"].append(img)
                rows["cell"].append(0)
                rows["row_off"].append(r0)
                rows["col_off"].append(c0)
                rows["h"].append(h)
                rows["w"].append(w)
                rows["bands"].append(p)
                rows["pixels"].append(
                    np.ascontiguousarray(blk).tobytes())
    return pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "image_id": pa.array(rows["image_id"], pa.string()),
        "cell": pa.array(rows["cell"], pa.uint64()),
        "row_off": pa.array(rows["row_off"], pa.int32()),
        "col_off": pa.array(rows["col_off"], pa.int32()),
        "h": pa.array(rows["h"], pa.int32()),
        "w": pa.array(rows["w"], pa.int32()),
        "bands": pa.array(rows["bands"], pa.int32()),
        "pixels": pa.array(rows["pixels"], pa.binary())})


@pytest.mark.parametrize("batch_size", [1, 64])
@pytest.mark.parametrize("factor", [2, 4])
def test_retile_exact_bytes(ray_session, batch_size, factor):
    T = 8
    images = _images()
    t = _tiles_table(images, T)
    out = retile(
        ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=batch_size),
        tile=T, factor=factor).to_pandas()
    edge = T * factor
    n_expected = sum(
        -(-a.shape[1] // edge) * -(-a.shape[2] // edge)
        for a in images.values())
    assert len(out) == n_expected
    for _, row in out.iterrows():
        arr = images[row["image_id"]]
        p, H, W = arr.shape
        r0, c0 = int(row["row_off"]), int(row["col_off"])
        ph, pw = int(row["h"]), int(row["w"])
        assert ph == min(edge, H - r0) and pw == min(edge, W - c0)
        got = np.frombuffer(row["pixels"], dtype=np.int16).reshape(
            (p, ph, pw))
        np.testing.assert_array_equal(
            got, arr[:, r0:r0 + ph, c0:c0 + pw],
            err_msg=str(row["tile_id"]))


def test_retile_summary_matches_direct(ray_session):
    from unmixing_ray.constants import NODATA
    T = 8
    images = _images(seed=13)
    # plant NoData so the valid mask is exercised
    images["im0"][0, :3, :5] = NODATA
    t = _tiles_table(images, T)
    parents = retile(ray.data.from_arrow(t), tile=T, factor=2)
    summ = retile_band0_summary(parents).to_pandas()
    for _, row in summ.iterrows():
        arr = images[row["image_id"]]
        r0 = int(row["parent_ty"]) * 2 * T
        c0 = int(row["parent_tx"]) * 2 * T
        b0 = arr[0, r0:r0 + 2 * T, c0:c0 + 2 * T].astype(np.int64)
        valid = b0 != NODATA
        assert row["b0_sum"] == b0[valid].sum()
        assert row["b0_n"] == valid.sum()

"""Focal mean with cross-tile halo exchange: the distributed result must
equal a full-image single-machine reference (proves the halo plumbing),
at several radii and batch sizes, including non-square image lattices."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from unmixing_ray.stages.focal import focal_mean_tiles, _box_filter_u


def _full_image_focal(arr, r, scale=1000):
    """Independent shift-sum reference over one full image."""
    p, H, W = arr.shape
    acc = np.zeros((p, H, W), dtype=np.int64)
    cnt = np.zeros((H, W), dtype=np.int64)
    for di in range(-r, r + 1):
        for dj in range(-r, r + 1):
            dst_r = slice(max(0, -di), H - max(0, di))
            src_r = slice(max(0, di), H - max(0, -di))
            dst_c = slice(max(0, -dj), W - max(0, dj))
            src_c = slice(max(0, dj), W - max(0, -dj))
            acc[:, dst_r, dst_c] += arr[:, src_r, src_c]
            cnt[dst_r, dst_c] += 1
    return (acc * np.int64(scale)) // cnt[None, :, :]


def _tiles_table(images, T):
    """images: dict image_id -> (p, H, W) int16 array, H,W multiples
    of T."""
    rows = {k: [] for k in ("tile_id", "image_id", "cell", "row_off",
                            "col_off", "h", "w", "bands", "pixels")}
    for img, arr in images.items():
        p, H, W = arr.shape
        for ty in range(H // T):
            for tx in range(W // T):
                blk = arr[:, ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
                rows["tile_id"].append("%s_t%d_%d" % (img, ty, tx))
                rows["image_id"].append(img)
                rows["cell"].append(0)
                rows["row_off"].append(ty * T)
                rows["col_off"].append(tx * T)
                rows["h"].append(T)
                rows["w"].append(T)
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


def _run_and_compare(images, T, r, batch_size):
    t = _tiles_table(images, T)
    out = focal_mean_tiles(
        ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=batch_size),
        radius=r).to_pandas()
    assert len(out) == t.num_rows
    for img, arr in images.items():
        want = _full_image_focal(arr, r)
        for _, row in out[out["image_id"] == img].iterrows():
            got = np.frombuffer(row["focal"], dtype=np.int64).reshape(
                (arr.shape[0], T, T))
            ro, co = int(row["row_off"]), int(row["col_off"])
            np.testing.assert_array_equal(
                got, want[:, ro:ro + T, co:co + T], err_msg=row["tile_id"])


@pytest.mark.parametrize("r", [1, 2, 3])
def test_focal_matches_full_image(ray_session, r):
    rng = np.random.default_rng(5)
    images = {
        "imgA": rng.integers(-100, 4000, (3, 32, 48)).astype(np.int16),
        "imgB": rng.integers(-100, 4000, (3, 48, 16)).astype(np.int16),
    }
    _run_and_compare(images, T=16, r=r, batch_size=3)


def test_focal_batching_invariant(ray_session):
    rng = np.random.default_rng(9)
    images = {"img%d" % i: rng.integers(0, 1000, (2, 32, 32))
              .astype(np.int16) for i in range(6)}
    for bs in (1, 7, 64):
        _run_and_compare(images, T=16, r=1, batch_size=bs)


def test_box_filter_kernel_vs_brute():
    rng = np.random.default_rng(3)
    r = 2
    vals = np.zeros((2, 10 + 2 * r, 12 + 2 * r), dtype=np.int64)
    valid = np.zeros((10 + 2 * r, 12 + 2 * r), dtype=np.int64)
    inner = rng.integers(-50, 50, (2, 10, 12))
    vals[:, r:-r, r:-r] = inner
    valid[r:-r, r:-r] = 1
    # partially valid halo (image continues on the right only)
    vals[:, r:-r, -r:] = rng.integers(-50, 50, (2, 10, r))
    valid[r:-r, -r:] = 1
    got = _box_filter_u(vals, valid, r, 1000)
    for b in range(2):
        for i in range(10):
            for j in range(12):
                s = c = 0
                for di in range(-r, r + 1):
                    for dj in range(-r, r + 1):
                        ii, jj = i + r + di, j + r + dj
                        if valid[ii, jj]:
                            s += int(vals[b, ii, jj])
                            c += 1
                assert got[b, i, j] == (s * 1000) // c


def test_focal_rejects_ragged_lattice(ray_session):
    t = pa.table({
        "tile_id": pa.array(["a_t0_0"], pa.string()),
        "image_id": pa.array(["a"], pa.string()),
        "cell": pa.array([0], pa.uint64()),
        "row_off": pa.array([8], pa.int32()),    # not a multiple of h
        "col_off": pa.array([0], pa.int32()),
        "h": pa.array([16], pa.int32()),
        "w": pa.array([16], pa.int32()),
        "bands": pa.array([1], pa.int32()),
        "pixels": pa.array([np.zeros((1, 16, 16), np.int16).tobytes()],
                           pa.binary())})
    with pytest.raises(Exception, match="uniform tile lattice"):
        focal_mean_tiles(ray.data.from_arrow(t)).to_pandas()


def _full_image_stat(arr, r, stat, scale=1000):
    p, H, W = arr.shape
    out = np.zeros((p, H, W), dtype=np.int64)
    a = arr.astype(np.int64)
    for i in range(H):
        for j in range(W):
            win = a[:, max(0, i - r):i + r + 1, max(0, j - r):j + r + 1]
            flat = win.reshape(p, -1)
            if stat == "var":
                c = flat.shape[1]
                s = flat.sum(axis=1)
                s2 = (flat * flat).sum(axis=1)
                out[:, i, j] = (c * s2 - s * s) * scale // (c * c)
            elif stat == "max":
                out[:, i, j] = flat.max(axis=1)
            else:
                out[:, i, j] = flat.min(axis=1)
    return out


@pytest.mark.parametrize("stat", ["var", "max", "min"])
def test_focal_stat_variants(ray_session, stat):
    from unmixing_ray.stages.focal import focal_stat_tiles
    rng = np.random.default_rng(21)
    images = {"im": rng.integers(-200, 3000, (2, 32, 32))
              .astype(np.int16)}
    t = _tiles_table(images, 16)
    out = focal_stat_tiles(ray.data.from_arrow(t), stat=stat,
                           radius=1).to_pandas()
    want = _full_image_stat(images["im"], 1, stat)
    for _, row in out.iterrows():
        got = np.frombuffer(row["focal"], dtype=np.int64).reshape(
            (2, 16, 16))
        ro, co = int(row["row_off"]), int(row["col_off"])
        np.testing.assert_array_equal(
            got, want[:, ro:ro + 16, co:co + 16], err_msg=row["tile_id"])


def _brute_conv_sums(arr, kernel):
    """Per-band brute-force kernel-response sums with the full-window
    border rule (window must lie entirely inside the image)."""
    p, H, W = arr.shape
    k = kernel.shape[0]
    r = k // 2
    a = arr.astype(np.int64)
    sums = {}
    n_valid = 0
    per_tile = {}
    for i in range(H):
        for j in range(W):
            if i < r or j < r or i >= H - r or j >= W - r:
                continue
            n_valid += 1
            for b in range(p):
                v = 0
                for di in range(k):
                    for dj in range(k):
                        v += int(kernel[di, dj]) * int(
                            a[b, i + di - r, j + dj - r])
                key = (i // 16, j // 16, b)
                per_tile[key] = per_tile.get(key, 0) + v
    return per_tile


def test_convolve_tiles_matches_brute(ray_session):
    from unmixing_ray.stages.focal import convolve_tiles
    rng = np.random.default_rng(31)
    k1 = np.array([1, 4, 6, 4, 1], dtype=np.int64)
    kernel = np.outer(k1, k1)
    images = {
        "cvA": rng.integers(-300, 4000, (2, 32, 48)).astype(np.int16),
        "cvB": rng.integers(-300, 4000, (2, 16, 16)).astype(np.int16),
    }
    t = _tiles_table(images, 16)
    out = convolve_tiles(ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=2),
        kernel).to_pandas()
    assert len(out) == t.num_rows * 2   # one row per (tile, band)
    for img, arr in images.items():
        want = _brute_conv_sums(arr, kernel)
        p, H, W = arr.shape
        for ty in range(H // 16):
            for tx in range(W // 16):
                for b in range(p):
                    row = out[(out["tile_id"] == "%s_t%d_%d"
                               % (img, ty, tx)) & (out["band"] == b)]
                    assert len(row) == 1
                    assert int(row["conv_sum"].iloc[0]) == \
                        want.get((ty, tx, b), 0), (img, ty, tx, b)
    # cvB is a single 16x16 tile: only the interior (16-4)^2 px valid
    nb = out[out["tile_id"] == "cvB_t0_0"]
    assert (nb["n_valid"] == 144).all()


def _mk_tiles(img, arr, tile):
    """Split (p,H,W) into lattice tile rows."""
    import pandas as pd
    p, H, W = arr.shape
    rows = []
    for r0 in range(0, H, tile):
        for c0 in range(0, W, tile):
            blk = arr[:, r0:r0 + tile, c0:c0 + tile]
            rows.append({"image_id": img, "row_off": r0, "col_off": c0,
                         "h": tile, "w": tile, "bands": p,
                         "pixels": np.ascontiguousarray(blk).tobytes()})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("hw", [(96, 96), (128, 64)])
def test_overview_partial_parents_match_full_image(ray_session, hw):
    from unmixing_ray.stages import pyramid
    rng = np.random.default_rng(13)
    H, W = hw
    arr = rng.integers(0, 8000, (3, H, W)).astype(np.int16)
    df = _mk_tiles("imgA", arr, 32)
    ds = ray.data.from_pandas(df).repartition(4)
    got = pyramid.build_overview(ds, factor=2).to_pandas()
    want = arr.astype(np.int64).reshape(
        (3, H // 2, 2, W // 2, 2)).sum(axis=(2, 4)) // 4
    for _, t in got.iterrows():
        a = np.frombuffer(t["pixels"], np.int64).reshape(
            (3, t["h"], t["w"]))
        r0 = int(t["prow"]) * 32
        c0 = int(t["pcol"]) * 32
        np.testing.assert_array_equal(
            a, want[:, r0:r0 + int(t["h"]), c0:c0 + int(t["w"])])
    # parents tile the downsampled image exactly once
    assert int(got["h"].astype(int).mul(got["w"].astype(int)).sum()) \
        * 3 == want.size


def test_pyramid_two_levels_floor_of_floor(ray_session):
    from unmixing_ray.stages import pyramid
    rng = np.random.default_rng(17)
    arr = rng.integers(0, 8000, (2, 128, 128)).astype(np.int16)
    ds = ray.data.from_pandas(_mk_tiles("imgB", arr, 32)).repartition(3)
    lv1, lv2 = pyramid.build_pyramid(ds, levels=2, factor=2)
    d1 = arr.astype(np.int64).reshape((2, 64, 2, 64, 2)).sum(
        axis=(2, 4)) // 4
    d2 = d1.reshape((2, 32, 2, 32, 2)).sum(axis=(2, 4)) // 4
    got2 = lv2.to_pandas()
    assert len(got2) == 1
    a = np.frombuffer(got2.iloc[0]["pixels"], np.int64).reshape(
        (2, 32, 32))
    np.testing.assert_array_equal(a, d2)

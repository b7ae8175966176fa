"""Terrain (Horn gradients) and warp (bilinear upsample) via the
cross-tile halo exchange: the distributed result must equal a
full-image single-machine reference — proving the halo plumbing, the
border rules, and batching invariance."""

import numpy as np
import pytest

import ray.data

from tests.test_focal import _tiles_table


def _full_image_horn(z):
    """Independent full-image Horn numerators (border rule: zero where
    the 3x3 neighborhood leaves the image)."""
    H, W = z.shape
    z = z.astype(np.int64)
    dzdx = np.zeros((H, W), np.int64)
    dzdy = np.zeros((H, W), np.int64)

    def sh(dr, dc):
        return z[1 + dr:H - 1 + dr, 1 + dc:W - 1 + dc]

    ii, jj = slice(1, H - 1), slice(1, W - 1)
    dzdx[ii, jj] = ((sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1))
                    - (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1)))
    dzdy[ii, jj] = ((sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))
                    - (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1)))
    ok = np.zeros((H, W), np.int64)
    ok[ii, jj] = 1
    return dzdx, dzdy, ok


def _full_image_warp(arr, num, den):
    """Independent full-image integer bilinear upsample (edge clamp)."""
    arr = arr.astype(np.int64)
    D = 2 * num

    def axis(n_in):
        n_out = n_in * num // den
        dst = np.arange(n_out, dtype=np.int64)
        src_num = (2 * dst + 1) * den - num
        i0 = src_num // D
        frac = src_num - i0 * D
        return (np.clip(i0, 0, n_in - 1), np.clip(i0 + 1, 0, n_in - 1),
                D - frac, frac)

    r0, r1, wy0, wy1 = axis(arr.shape[1])
    c0, c1, wx0, wx1 = axis(arr.shape[2])
    V = (wy0[:, None] * (wx0[None, :] * arr[:, r0[:, None], c0[None, :]]
                         + wx1[None, :] * arr[:, r0[:, None], c1[None, :]])
         + wy1[:, None] * (wx0[None, :] * arr[:, r1[:, None], c0[None, :]]
                           + wx1[None, :] * arr[:, r1[:, None],
                                                c1[None, :]]))
    return V // (D * D)


def _images(seed=3, shapes=((3, 16, 24), (2, 8, 8), (1, 24, 16))):
    rng = np.random.default_rng(seed)
    return {
        "im%d" % i: rng.integers(-200, 4000, s).astype(np.int16)
        for i, s in enumerate(shapes)}


@pytest.mark.parametrize("batch_size", [1, 7, 64])
def test_terrain_matches_full_image(ray_session, batch_size):
    from unmixing_ray.stages.terrain import terrain_slope_tiles
    T = 8
    images = _images()
    t = _tiles_table(images, T)
    out = terrain_slope_tiles(
        ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow",
            batch_size=batch_size)).to_pandas()
    assert len(out) == t.num_rows
    by_tid = out.set_index("tile_id")
    for img, arr in images.items():
        dzdx, dzdy, ok = _full_image_horn(arr[0])
        H, W = arr.shape[1:]
        for ty in range(H // T):
            for tx in range(W // T):
                rs = slice(ty * T, (ty + 1) * T)
                cs = slice(tx * T, (tx + 1) * T)
                row = by_tid.loc["%s_t%d_%d" % (img, ty, tx)]
                assert row["sum_abs_dzdx"] == np.abs(dzdx[rs, cs]).sum()
                assert row["sum_abs_dzdy"] == np.abs(dzdy[rs, cs]).sum()
                assert row["sum_rugged"] == (
                    dzdx[rs, cs] ** 2 + dzdy[rs, cs] ** 2).sum()
                assert row["n_valid"] == ok[rs, cs].sum()


@pytest.mark.parametrize("num,den", [(5, 4), (2, 1), (3, 2)])
def test_warp_matches_full_image(ray_session, num, den):
    from unmixing_ray.stages.warp import warp_tiles
    T = 8
    images = _images(seed=11)
    t = _tiles_table(images, T)
    out = warp_tiles(
        ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=5),
        num=num, den=den).to_pandas()
    assert len(out) == t.num_rows
    t_out = T * num // den
    for img, arr in images.items():
        want = _full_image_warp(arr, num, den)
        sel = out[out["image_id"] == img]
        for _, row in sel.iterrows():
            got = np.frombuffer(row["warped"], dtype=np.int64).reshape(
                (arr.shape[0], t_out, t_out))
            ro, co = int(row["out_row_off"]), int(row["out_col_off"])
            np.testing.assert_array_equal(
                got, want[:, ro:ro + t_out, co:co + t_out],
                err_msg=row["tile_id"])


def test_warp_rejects_downsample(ray_session):
    from unmixing_ray.stages.warp import make_warp_assemble
    with pytest.raises(ValueError):
        make_warp_assemble(1, 2)


def test_warp_band_sums_roundtrip(ray_session):
    from unmixing_ray.stages.warp import warp_band_sums, warp_tiles
    T = 8
    images = _images(seed=5)
    t = _tiles_table(images, T)
    warped = warp_tiles(ray.data.from_arrow(t), num=5, den=4)
    sums = warp_band_sums(warped).to_pandas()
    total = 0
    for img, arr in images.items():
        total += arr.shape[0] * (arr.shape[1] // T) * (arr.shape[2] // T)
        want = _full_image_warp(arr, 5, 4).sum(axis=(1, 2))
        got = sums[sums["tile_id"].str.startswith(img)] \
            .groupby("band")["warp_sum"].sum()
        np.testing.assert_array_equal(got.to_numpy(), want)
    assert len(sums) == total


@pytest.mark.parametrize("batch_size", [1, 64])
def test_hillshade_matches_full_image(ray_session, batch_size):
    from unmixing_ray.stages.terrain import hillshade_tiles, hillshade_u
    T = 8
    cell, az, alt = 30.0, 315.0, 45.0
    images = _images(seed=21)
    t = _tiles_table(images, T)
    out = hillshade_tiles(
        ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow",
            batch_size=batch_size),
        cellsize=cell, azimuth_deg=az, altitude_deg=alt).to_pandas()
    assert len(out) == t.num_rows
    by_tid = out.set_index("tile_id")
    for img, arr in images.items():
        dzdx, dzdy, ok = _full_image_horn(arr[0])
        hs = hillshade_u(dzdx, dzdy, ok, cell, az, alt)
        H, W = arr.shape[1:]
        for ty in range(H // T):
            for tx in range(W // T):
                rs = slice(ty * T, (ty + 1) * T)
                cs = slice(tx * T, (tx + 1) * T)
                row = by_tid.loc["%s_t%d_%d" % (img, ty, tx)]
                assert row["sum_hs_u"] == hs[rs, cs].sum()
                assert row["n_valid"] == ok[rs, cs].sum()


def test_hillshade_flat_dem_is_sine_altitude(ray_session):
    from unmixing_ray.stages.terrain import hillshade_u
    # flat terrain: shading = sin(altitude) regardless of azimuth
    z = np.zeros((6, 6), np.int64)
    ok = np.ones((6, 6), np.int64)
    hs = hillshade_u(z, z, ok, 30.0, azimuth_deg=200.0, altitude_deg=30.0)
    assert (hs == int(np.floor(np.sin(np.deg2rad(30.0)) * 255.0))).all()

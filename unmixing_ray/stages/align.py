"""Raster alignment / intersection + validation stages.

- ``intersect_tiles``: the engine form of ``intersect_rasters``
  (reference utils.py:676-731): two tile sets on the same cell grid are
  co-grouped by cell; the source tile is resampled onto the reference
  tile's grid (nearest-neighbor for identical resolutions, bilinear
  otherwise — reference uses GRA_Bilinear) and clipped/padded to the
  reference extent with NoData fill.
- ``validate_forward_model``: distributed forward-model RMSE
  (reference lsma.py:232-297): per-batch residual partials over a seeded
  global sample → driver merge → normalized percent RMSE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..constants import NODATA
from ..kernels.spectral import predict_spectra_from_abundance


def _resample_to(ref_gt, ref_h, ref_w, src, src_gt, nodata=NODATA):
    """Sample src (p, m, n) at the centers of the reference grid
    (nearest neighbor; exact when grids share resolution/registration)."""
    p = src.shape[0]
    out = np.full((p, ref_h, ref_w), nodata, dtype=np.float64)
    cols = np.arange(ref_w)
    rows = np.arange(ref_h)
    xs = ref_gt[0] + (cols + 0.5) * ref_gt[1]
    ys = ref_gt[3] + (rows + 0.5) * ref_gt[5]
    sx = np.floor((xs - src_gt[0]) / src_gt[1]).astype(np.int64)
    sy = np.floor((ys - src_gt[3]) / src_gt[5]).astype(np.int64)
    ok_x = (sx >= 0) & (sx < src.shape[2])
    ok_y = (sy >= 0) & (sy < src.shape[1])
    gy, gx = np.meshgrid(np.nonzero(ok_y)[0], np.nonzero(ok_x)[0],
                         indexing="ij")
    out[:, gy, gx] = src[:, sy[ok_y][:, None].repeat(ok_x.sum(), 1),
                         sx[ok_x][None, :].repeat(ok_y.sum(), 0)]
    return out


def intersect_tiles(ref_tiles, src_tiles, nodata=NODATA, key="cell"):
    """Co-group two tile Datasets by ``key`` (default the cell; pass
    ``["image_id", "cell"]`` when several images share a cell grid);
    emit the source tile resampled onto each reference tile's grid.
    Rows: (cell, tile_id, pixels, ...). Both sides must carry a
    ``side`` column ('ref'/'src') — use ``tag_side``. Keys present on
    only one side are dropped (the intersection)."""
    key_cols = [key] if isinstance(key, str) else list(key)

    def align_group(g: pd.DataFrame) -> pd.DataFrame:
        refs = g[g["side"] == "ref"]
        srcs = g[g["side"] == "src"]
        if not len(refs) or not len(srcs):
            return pd.DataFrame({c: [] for c in (
                "cell", "tile_id", "bands", "h", "w", "pixels")})
        from .decode import as_pixels
        src_row = srcs.iloc[0]
        raw = as_pixels(src_row["pixels"], src_row["bands"],
                        src_row["h"], src_row["w"],
                        dtype=np.int16) if isinstance(
            src_row["pixels"], (bytes, bytearray)) else \
            np.asarray(src_row["pixels"]).reshape(
                (int(src_row["bands"]), int(src_row["h"]),
                 int(src_row["w"])))
        src_arr = raw.astype(np.float64)
        src_gt = tuple(src_row["gt"])
        rows = {c: [] for c in ("cell", "tile_id", "bands", "h", "w",
                                "pixels")}
        for _, ref in refs.iterrows():
            out = _resample_to(tuple(ref["gt"]), int(ref["h"]),
                               int(ref["w"]), src_arr, src_gt, nodata)
            rows["cell"].append(ref["cell"])
            rows["tile_id"].append(ref["tile_id"])
            rows["bands"].append(out.shape[0])
            rows["h"].append(out.shape[1])
            rows["w"].append(out.shape[2])
            rows["pixels"].append(out.astype(np.float32).ravel().tolist())
        return pd.DataFrame(rows)

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array([side] * batch.num_rows, pa.string()))
        return fn

    cols = ["cell", "tile_id", "bands", "h", "w", "pixels", "gt"]
    cols += [k for k in key_cols if k not in cols]
    ref = ref_tiles.select_columns(cols).map_batches(
        tag("ref"), batch_format="pyarrow")
    src = src_tiles.select_columns(cols).map_batches(
        tag("src"), batch_format="pyarrow")
    return ref.union(src).groupby(
        key_cols[0] if len(key_cols) == 1 else key_cols).map_groups(
        align_group, batch_format="pandas")


def validate_forward_model(tiles, abundances_by_tile, ref_spectra,
                           sample_rate=0.04, seed=42, nodata=NODATA,
                           as_pct=True):
    """Distributed forward-model RMSE (reference lsma.py:232-297).

    tiles: Dataset with reflectance pixels; abundances_by_tile: dict
    tile_id -> (q, h*w) abundances (or a Dataset joined upstream);
    ref_spectra: (q, p) reflectance-space endmember spectra.
    ``sample_rate`` is an explicit per-pixel sampling PROBABILITY (the
    reference samples a fixed count r from an in-RAM raster,
    lsma.py:283; a distributed pass can't know the corpus pixel count
    up front without an extra pass, so the knob is the rate — expected
    sample size = rate * corpus pixels, predictable at every scale).
    The draw is seeded per tile_id — batching-invariant.
    """
    import ray
    ref_spectra = np.asarray(ref_spectra, dtype=np.float64)
    n_em = ref_spectra.shape[0]
    ab_ref = ray.put(abundances_by_tile)

    def partials(batch: pa.Table) -> pa.Table:
        import hashlib
        ab_map = ray.get(ab_ref)
        from .decode import tiles_to_ndarray
        arrays, uniform = tiles_to_ndarray(batch)
        sq_sum = 0.0
        n_samp = 0
        max_val = -np.inf
        for i in range(batch.num_rows):
            tid = batch["tile_id"][i].as_py()
            if tid not in ab_map:
                continue
            a = (uniform[i] if uniform is not None else arrays[i])\
                .astype(np.float64)
            p = a.shape[0]
            flat = a.reshape(p, -1)
            ab = np.asarray(ab_map[tid], dtype=np.float64)
            preds = predict_spectra_from_abundance(ab.T, ref_spectra)
            npx = flat.shape[1]
            # deterministic per-pixel sample: blake2 of (tile, pixel)
            h = int.from_bytes(hashlib.blake2b(
                tid.encode(), digest_size=8).digest(), "little")
            rng = np.random.default_rng(np.random.SeedSequence(
                [seed, h & 0x7FFFFFFF]))
            take = rng.random(npx) < min(1.0, float(sample_rate))
            idx = np.nonzero(take & (flat[0] != nodata))[0]
            if not len(idx):
                continue
            resid = flat[:, idx] - preds[:, idx]
            rmse_px = np.sqrt(np.square(resid).sum(axis=0) / n_em)
            sq_sum += rmse_px.sum()
            n_samp += len(idx)
            max_val = max(max_val, float(flat.max()))
        return pa.table({
            "sq_sum": pa.array([sq_sum]),
            "n": pa.array([n_samp]),
            "max_val": pa.array([max_val]),
        })

    rows = tiles.map_batches(partials, batch_format="pyarrow").take_all()
    total = sum(r_["sq_sum"] for r_ in rows)
    n = sum(r_["n"] for r_ in rows)
    mx = max((r_["max_val"] for r_ in rows), default=1.0)
    if n == 0:
        return None
    rmse_value = total / n
    if as_pct:
        return round(rmse_value / mx * 100, 2)
    return round(rmse_value, 2)


def forward_model_rmse_streaming(tiles, ref_spectra, sample_rate=0.04,
                                 seed=42, nodata=NODATA, as_pct=True):
    """Fused unmix + forward-model validation in ONE streaming pass
    (reference lsma.py:232-297 flow): each batch FCLS-unmixes its own
    tiles against the known reference spectra, forward-models, and emits
    tiny residual partials — abundances never leave the worker (the
    round-1 version collected every tile's abundance into a driver dict
    and broadcast it back). ``sample_rate`` is the per-pixel sampling
    probability (see validate_forward_model). Returns
    (rmse_pct_or_value, n_tiles)."""
    from ..kernels import nnls
    ref_spectra = np.asarray(ref_spectra, dtype=np.float64)
    n_em = ref_spectra.shape[0]

    def partials(batch: pa.Table) -> pa.Table:
        import hashlib
        from .decode import tiles_to_ndarray
        arrays, uniform = tiles_to_ndarray(batch)
        sq_sum = 0.0
        n_samp = 0
        max_val = -np.inf
        n_tiles = 0
        for i in range(batch.num_rows):
            tid = batch["tile_id"][i].as_py()
            a = (uniform[i] if uniform is not None else arrays[i])\
                .astype(np.float64)
            p = a.shape[0]
            flat = a.reshape(p, -1)
            ab = nnls.fcls_pixels(flat.T, ref_spectra).T   # (q, npx)
            preds = predict_spectra_from_abundance(ab.T, ref_spectra)
            npx = flat.shape[1]
            h = int.from_bytes(hashlib.blake2b(
                tid.encode(), digest_size=8).digest(), "little")
            rng = np.random.default_rng(np.random.SeedSequence(
                [seed, h & 0x7FFFFFFF]))
            take = rng.random(npx) < min(1.0, float(sample_rate))
            idx = np.nonzero(take & (flat[0] != nodata))[0]
            n_tiles += 1
            if not len(idx):
                continue
            resid = flat[:, idx] - preds[:, idx]
            rmse_px = np.sqrt(np.square(resid).sum(axis=0) / n_em)
            sq_sum += rmse_px.sum()
            n_samp += len(idx)
            max_val = max(max_val, float(flat.max()))
        return pa.table({
            "sq_sum": pa.array([sq_sum]),
            "n": pa.array([n_samp]),
            "max_val": pa.array([max_val]),
            "n_tiles": pa.array([n_tiles]),
        })

    rows = tiles.map_batches(partials, batch_format="pyarrow").take_all()
    total = sum(r_["sq_sum"] for r_ in rows)
    n = sum(r_["n"] for r_ in rows)
    n_tiles = sum(r_["n_tiles"] for r_ in rows)
    mx = max((r_["max_val"] for r_ in rows), default=1.0)
    if n == 0:
        return None, n_tiles
    rmse_value = total / n
    if as_pct:
        return round(rmse_value / mx * 100, 2), n_tiles
    return round(rmse_value, 2), n_tiles

"""SASMA pipeline: spatially adaptive spectral mixture analysis.

Reference flow (SURVEY.md §3.2, docs SASMA notebook): MNF features +
BCI/NDVI → CART-labeled candidate endmembers → IDW window interpolation of
per-class endmember spectra → per-pixel (MESMA) FCLS → instability mask.

Engine mapping:
1. ``fit_cart_distributed``: every batch emits its labeled training
   pixels (features where the label raster is non-zero — a tiny fraction);
   the pooled sample fits ONE deterministic CART on the driver
   (reference fits on the full image in RAM, sasma.py:37-76). The fitted
   tree serializes to numpy arrays and broadcasts into the predict stage.
2. ``sasma_unmix_by_image``: ``groupby(image_id)`` reassembles each
   image's tiles (the IDW window, up to 110 px, exceeds any tile halo, so
   the halo unit is the image — the reference's own working extent), then
   per group: CART predict → per-class masked spectra → IDW interpolation
   (FFT kernel) → concat to (c, q, p) per-pixel endmembers → exact MESMA
   FCLS → instability mask → abundance tile rows back out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..constants import NODATA
from ..kernels import idw as idw_k
from ..kernels import nnls
from ..kernels.cart import DecisionTree
from ..kernels.spectral import mask_unstable_abundances


def _assemble_image(g: pd.DataFrame, col="pixels"):
    """Reassemble a full image array from its tile rows."""
    h = int(g["row_off"].max() + g.loc[g["row_off"].idxmax(), "h"])
    w = int(g["col_off"].max() + g.loc[g["col_off"].idxmax(), "w"])
    p = int(g["bands"].iloc[0])
    arr = np.full((p, h, w), NODATA, dtype=np.float64)
    for _, row in g.iterrows():
        v = row[col]
        if isinstance(v, (bytes, bytearray)):
            a = np.frombuffer(v, dtype=np.float32).astype(
                np.float64).reshape((p, int(row["h"]), int(row["w"])))
        else:
            a = np.asarray(v, dtype=np.float64).reshape(
                (p, int(row["h"]), int(row["w"])))
        arr[:, row["row_off"]:row["row_off"] + int(row["h"]),
            row["col_off"]:row["col_off"] + int(row["w"])] = a
    return arr


def label_pixels(arr, em_spectra, max_dist=None):
    """Deterministic candidate labeling for SASMA: each pixel whose
    spectrum is within ``max_dist`` of one of the q reference endmember
    spectra gets that class label (1..q); 0 elsewhere. (The reference uses
    an externally provided PIF raster; the engine derives candidates from
    spectral proximity so the pipeline is self-contained.)"""
    p, h, w = arr.shape
    X = arr.reshape(p, -1).T
    d = np.linalg.norm(X[:, None, :] - em_spectra[None, :, :], axis=2)
    nearest = np.argmin(d, axis=1)
    dmin = d[np.arange(len(X)), nearest]
    if max_dist is None:
        max_dist = np.percentile(dmin, 10.0)
    labels = np.where(dmin <= max_dist, nearest + 1, 0)
    labels[X[:, 0] == NODATA] = 0
    return labels.reshape(1, h, w).astype(np.int32)


def _sample_hash(tile_ids, pixels):
    """Deterministic 63-bit hash per (tile_id, pixel) candidate — the
    global sampling order. A pure function of row content, so the
    selected pool is batching- and parallelism-invariant."""
    import hashlib
    out = np.empty(len(tile_ids), dtype=np.int64)
    for i, (t, p) in enumerate(zip(tile_ids, pixels)):
        d = hashlib.blake2b(("%s:%d" % (t, int(p))).encode(),
                            digest_size=8).digest()
        out[i] = int.from_bytes(d, "little") & 0x7FFFFFFFFFFFFFFF
    return out


def fit_cart_distributed(tiles, em_spectra, feature_bands=(0, 1),
                         params=None, max_samples=50000,
                         input_col="pixels", per_tile_cap=64,
                         return_stats=False):
    """Streaming training-pixel collection → driver CART fit.
    Features = the first MNF/feature bands; labels from label_pixels.

    Scale contract (driver memory O(max_samples), INDEPENDENT of tile
    count — round 2 still concatenated O(n_tiles * per_tile_cap) rows
    before capping): each tile contributes at most ``per_tile_cap``
    labeled pixels (deterministic in-tile stride), every candidate gets
    a content hash, each batch emits only its ``pool_cap`` smallest-hash
    rows, and the driver STREAMS the batch partials keeping a running
    smallest-``pool_cap`` pool (the global smallest-K of a union is the
    smallest-K of the per-batch smallest-Ks, so the result equals the
    unbounded collect's hash-smallest subset at any batching). The final
    pool is sorted by (tile_id, pixel) and stride-capped at
    ``max_samples`` as before, preserving the determinism pin."""
    em_spectra = np.asarray(em_spectra, dtype=np.float64)
    pool_cap = 4 * int(max_samples)

    def collect(batch: pa.Table) -> pa.Table:
        from ..stages.decode import tiles_to_ndarray
        from ..stages.mnf import mnf_pixels_view
        if input_col == "mnf":
            arrays, uniform = mnf_pixels_view(batch)
        else:
            arrays, uniform = tiles_to_ndarray(batch)
        tile_ids = batch["tile_id"].to_pylist()
        feats = []
        labs = []
        tids = []
        pxs = []
        for i in range(batch.num_rows):
            a = (uniform[i] if uniform is not None else arrays[i])\
                .astype(np.float64)
            lab = label_pixels(a, em_spectra).ravel()
            idx = np.nonzero(lab != 0)[0]
            if not len(idx):
                continue
            if len(idx) > per_tile_cap:
                step = int(np.ceil(len(idx) / per_tile_cap))
                idx = idx[::step]
            X = a.reshape(a.shape[0], -1).T[idx][:, list(feature_bands)]
            feats.append(X)
            labs.append(lab[idx])
            tids.extend([tile_ids[i]] * len(idx))
            pxs.extend(idx.tolist())
        X = np.vstack(feats) if feats else np.empty((0,
                                                     len(feature_bands)))
        y = np.concatenate(labs) if labs else np.empty(0, np.int64)
        sh = _sample_hash(tids, pxs)
        tbl = pd.DataFrame({
            "tile_id": np.asarray(tids, dtype=object),
            "pixel": np.asarray(pxs, dtype=np.int32),
            "sample_hash": sh,
            "x": [r.tolist() for r in X],
            "y": y.astype(np.int64),
        })
        if len(tbl) > pool_cap:
            tbl = tbl.sort_values(["sample_hash", "tile_id", "pixel"],
                                  kind="stable").head(pool_cap)
        return tbl

    # driver streaming merge: hold at most ~2*pool_cap rows at any time
    pool = None
    held_max = 0
    for part in tiles.map_batches(collect, batch_format="pyarrow")\
            .iter_batches(batch_format="pandas"):
        if not len(part):
            continue
        pool = part if pool is None else pd.concat([pool, part],
                                                   ignore_index=True)
        held_max = max(held_max, len(pool))
        if len(pool) > pool_cap:
            pool = pool.sort_values(["sample_hash", "tile_id", "pixel"],
                                    kind="stable").head(pool_cap)
    if pool is None:
        pool = pd.DataFrame({"tile_id": [], "pixel": [],
                             "sample_hash": [], "x": [], "y": []})
    rows = pool.sort_values(["tile_id", "pixel"], kind="stable")\
        .reset_index(drop=True)
    X = np.array(rows["x"].tolist()) if len(rows) else \
        np.empty((0, len(feature_bands)))
    y = rows["y"].to_numpy(dtype=np.int64)
    if len(X) > max_samples:
        # deterministic stride subsample over the sorted pool
        step = int(np.ceil(len(X) / max_samples))
        X, y = X[::step], y[::step]
    tree = DecisionTree(**(params or {"max_depth": 10})).fit(X, y)
    if return_stats:
        return tree, {"pool_cap": pool_cap, "held_max": held_max,
                      "fit_rows": len(X)}
    return tree


def sasma_unmix_by_image(tiles, tree_arrays, em_spectra,
                         feature_bands=(0, 1), window_size=11, q=3,
                         n_dims=2, instability_band=1,
                         input_col="pixels"):
    """groupby(image_id) → per-image SASMA: predict labels, IDW-interpolate
    per-class endmember maps, MESMA-unmix, mask unstable abundances."""
    em_spectra = np.asarray(em_spectra, dtype=np.float64)
    window = idw_k.kernel_idw_l1(window_size)

    def per_image(g: pd.DataFrame) -> pd.DataFrame:
        tree = DecisionTree.from_arrays(tree_arrays)
        arr = _assemble_image(g, col=input_col)
        p, h, w = arr.shape
        X = arr.reshape(p, -1).T
        labels = tree.predict(X[:, list(feature_bands)])\
            .reshape(1, h, w).astype(np.int32)
        labels[0][arr[0] == NODATA] = 0
        # synthesize per-class endmember maps over the first n_dims bands
        synth = idw_k.interpolate_endmember_map(
            arr, labels, window, q=q, n=n_dims)
        filled = []
        for s in synth:
            s2 = np.where(np.isnan(s), 0.0, s)
            filled.append(s2)
        per_px = idw_k.concat_endmember_arrays(*filled)  # (c, q, n_dims)
        ab = nnls.fcls_pixelwise_endmembers(
            X[:, :n_dims], per_px).T.reshape(q, h, w)
        ab = mask_unstable_abundances(ab, band=instability_band)
        # re-emit per-tile abundance rows
        rows = {"tile_id": [], "image_id": [], "cell": [], "h": [],
                "w": [], "q": [], "abundance": []}
        for _, row in g.iterrows():
            r0, c0 = int(row["row_off"]), int(row["col_off"])
            th, tw = int(row["h"]), int(row["w"])
            sub = ab[:, r0:r0 + th, c0:c0 + tw]
            rows["tile_id"].append(row["tile_id"])
            rows["image_id"].append(row["image_id"])
            rows["cell"].append(row["cell"])
            rows["h"].append(th)
            rows["w"].append(tw)
            rows["q"].append(q)
            rows["abundance"].append(
                sub.astype(np.float32).ravel().tolist())
        return pd.DataFrame(rows)

    return tiles.groupby("image_id").map_groups(
        per_image, batch_format="pandas")


def run_sasma(tiles_mnf, em_spectra, q=3, n_dims=2, window_size=11):
    """End-to-end SASMA over MNF tiles (features = the mnf column)."""
    tree = fit_cart_distributed(tiles_mnf, em_spectra, input_col="mnf")
    return sasma_unmix_by_image(
        tiles_mnf.drop_columns(["pixels", "qa", "gt", "crs", "caption"]),
        tree.to_arrays(), em_spectra, window_size=window_size, q=q,
        n_dims=n_dims, input_col="mnf")

"""Distributed MNF: two-pass fit/transform over the tiles table.

Pass 1 (``fit``): every batch reduces to ONE tiny partial-statistics row
(sums, cross-products, shift-difference cross-products — kernels/mnf.py);
the driver merges partials (exactly associative) and eigendecomposes.
Pass 2 (``transform``): the (p×p) rotation matrix is broadcast by value
into a stateless ``map_batches`` that projects every tile and emits an
``mnf`` list<float32> column alongside the original pixels.

Reference: transform.py:104-118 computes the same statistics on a whole
in-RAM image; the partial/merge split makes the identical math streaming
(SURVEY.md §2.7 "MNF" row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..constants import NODATA
from ..kernels import mnf as mnf_k
from .decode import tiles_to_ndarray


def _stats_batch(batch: pa.Table) -> pa.Table:
    arrays, uniform = tiles_to_ndarray(batch)
    if uniform is not None:
        # one partial for the whole batch, computed vectorized:
        # reshape (n, p, h, w) -> treat as p x (n*h*w) for sums/crossprods;
        # horizontal diffs stay within tiles (rows are per-tile)
        n, p, h, w = uniform.shape
        a = uniform.astype(np.float64).copy()
        a[a == NODATA] = 0.0
        X = a.transpose(1, 0, 2, 3).reshape(p, -1)
        d = (a[:, :, :, :-1] - a[:, :, :, 1:])\
            .transpose(1, 0, 2, 3).reshape(p, -1)
        part = {
            "n": X.shape[1], "s": X.sum(axis=1), "ss": X @ X.T,
            "dn": d.shape[1], "ds": d.sum(axis=1), "dss": d @ d.T,
        }
    else:
        part = mnf_k.merge_stats([mnf_k.partial_stats(a) for a in arrays])
    return pa.table({
        "n": pa.array([part["n"]], pa.int64()),
        "s": pa.array([part["s"].tolist()], pa.list_(pa.float64())),
        "ss": pa.array([part["ss"].ravel().tolist()],
                       pa.list_(pa.float64())),
        "dn": pa.array([part["dn"]], pa.int64()),
        "ds": pa.array([part["ds"].tolist()], pa.list_(pa.float64())),
        "dss": pa.array([part["dss"].ravel().tolist()],
                        pa.list_(pa.float64())),
    })


def batch_partial_stats(batch: pa.Table):
    """Side-channel form of the MNF partial statistics (picklable dict)
    for piggybacking on the tile-checkpoint write pass."""
    tbl = _stats_batch(batch)
    row = tbl.to_pylist()[0]
    return row


def merge_partial_stats(rows):
    """Merged side-channel stats → (rotation W, snr)."""
    parts = []
    for row in rows:
        p = len(row["s"])
        parts.append({
            "n": row["n"], "s": np.asarray(row["s"]),
            "ss": np.asarray(row["ss"]).reshape(p, p),
            "dn": row["dn"], "ds": np.asarray(row["ds"]),
            "dss": np.asarray(row["dss"]).reshape(p, p),
        })
    merged = mnf_k.merge_stats(parts)
    return mnf_k.rotation_from_stats(merged)


def fit_mnf(tiles):
    """One streaming pass → (rotation W, snr eigenvalues). The collected
    result is O(num_batches × p²) — tiny."""
    partials = tiles.map_batches(
        _stats_batch, batch_format="pyarrow").take_all()
    parts = []
    for row in partials:
        p = len(row["s"])
        parts.append({
            "n": row["n"], "s": np.asarray(row["s"]),
            "ss": np.asarray(row["ss"]).reshape(p, p),
            "dn": row["dn"], "ds": np.asarray(row["ds"]),
            "dss": np.asarray(row["dss"]).reshape(p, p),
        })
    merged = mnf_k.merge_stats(parts)
    return mnf_k.rotation_from_stats(merged)


def make_apply_mnf(W, drop=(), n_components=None):
    """Stateless projection stage: adds an ``mnf`` list<float32> column
    (band-major (p, h, w) per tile, components along the band axis).

    ``drop``: columns to project away from the output (e.g.
    ("pixels", "qa") when only the MNF view flows downstream) — the raw
    payloads are ~14 KB/tile of dead weight through the object store
    exchange to the unmix actor pool otherwise.

    ``n_components``: keep only the first k MNF components and rewrite
    the ``bands`` column to k (FCLS uses k = q-1 dims, so shipping all
    p components triples the exchanged bytes for nothing). Requires
    ``pixels`` in ``drop`` — with a truncated bands column the raw
    payload could no longer be reinterpreted."""
    W = np.asarray(W, dtype=np.float64)
    if n_components is not None and "pixels" not in drop:
        raise ValueError("n_components truncation requires dropping "
                         "the pixels column")

    def apply_batch(batch: pa.Table) -> pa.Table:
        arrays, uniform = tiles_to_ndarray(batch)
        if uniform is not None:
            n, p, h, w = uniform.shape
            k = p if n_components is None else min(n_components, p)
            a = uniform.astype(np.float64).copy()
            a[a == NODATA] = 0.0
            X = a.transpose(1, 0, 2, 3).reshape(p, -1)
            proj = (W.T[:k] @ X).reshape(k, n, h, w)\
                .transpose(1, 0, 2, 3)
            values = proj.astype(np.float32).reshape(-1)
            sizes = np.full(n, k * h * w, dtype=np.int64)
            ks = np.full(n, k, dtype=np.int32)
        else:
            outs = []
            ks = np.empty(len(arrays), dtype=np.int32)
            for i, a in enumerate(arrays):
                full = mnf_k.apply_rotation(a, W)
                k = full.shape[0] if n_components is None else \
                    min(n_components, full.shape[0])
                ks[i] = k
                outs.append(full[:k].astype(np.float32).ravel())
            values = np.concatenate(outs) if outs else np.empty(
                0, np.float32)
            sizes = np.array([o.size for o in outs], dtype=np.int64)
        from .decode import binary_column
        bounds = np.zeros(len(sizes) + 1, dtype=np.int64)
        np.cumsum(sizes, out=bounds[1:])
        chunks = [values[bounds[i]:bounds[i + 1]]
                  for i in range(len(sizes))]
        out = batch.append_column("mnf", binary_column(chunks))
        if n_components is not None:
            i = out.column_names.index("bands")
            out = out.set_column(i, "bands", pa.array(ks, pa.int32()))
        keep = [c for c in out.column_names if c not in drop]
        return out.select(keep) if len(keep) < out.num_columns else out

    return apply_batch


def mnf_pixels_view(batch: pa.Table):
    """(n, p, h, w) float32 view of the mnf column for uniform batches,
    else per-tile list."""
    from .decode import binary_views
    values, offsets = binary_views(batch["mnf"], np.float32)
    bands = batch["bands"].to_numpy()
    hs = batch["h"].to_numpy()
    ws = batch["w"].to_numpy()
    n = batch.num_rows
    if n and (bands == bands[0]).all() and (hs == hs[0]).all() \
            and (ws == ws[0]).all():
        return None, values[offsets[0]:offsets[-1]].reshape(
            (n, int(bands[0]), int(hs[0]), int(ws[0])))
    arrays = [values[offsets[i]:offsets[i + 1]].reshape(
        (int(bands[i]), int(hs[i]), int(ws[i]))) for i in range(n)]
    return arrays, None

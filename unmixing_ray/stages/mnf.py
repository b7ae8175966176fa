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


def zeroed_float64(batch: pa.Table):
    """(n, p, h, w) float64 view of a uniform batch's pixels with NoData
    zeroed (the shared precomputation for every side-channel consumer —
    stats and candidates each making their own conversion cost ~18 s of
    pure memory streaming on a 192k-tile write pass), or None for
    mixed-shape batches."""
    arrays, uniform = tiles_to_ndarray(batch)
    if uniform is None:
        return arrays, None
    a = uniform.astype(np.float64)          # astype already copies
    a[a == NODATA] = 0.0
    return None, a


def partial_stats_from_zeroed(a):
    """MNF partial statistics from a pre-zeroed (n, p, h, w) float64
    batch array. Batched strided gemms (matmul on views) instead of the
    old transpose+reshape copies — per-tile products summed, exact for
    integer-valued reflectance (every intermediate < 2^53)."""
    n, p, h, w = a.shape
    A = a.reshape(n, p, h * w)
    s = A.sum(axis=(0, 2))
    ss = np.matmul(A, A.transpose(0, 2, 1)).sum(axis=0)
    d = a[:, :, :, :-1] - a[:, :, :, 1:]
    D = d.reshape(n, p, h * (w - 1))
    ds = D.sum(axis=(0, 2))
    dss = np.matmul(D, D.transpose(0, 2, 1)).sum(axis=0)
    return {"n": n * h * w, "s": s, "ss": ss,
            "dn": n * h * (w - 1), "ds": ds, "dss": dss}


def _stats_batch(batch: pa.Table) -> pa.Table:
    arrays, a = zeroed_float64(batch)
    if a is not None:
        part = partial_stats_from_zeroed(a)
    else:
        part = mnf_k.merge_stats([mnf_k.partial_stats(x) for x in arrays])
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


def _part_to_row(part):
    return {"n": int(part["n"]), "s": np.asarray(part["s"]).tolist(),
            "ss": np.asarray(part["ss"]).ravel().tolist(),
            "dn": int(part["dn"]),
            "ds": np.asarray(part["ds"]).tolist(),
            "dss": np.asarray(part["dss"]).ravel().tolist()}


def batch_partial_stats(batch: pa.Table):
    """Side-channel form of the MNF partial statistics (picklable dict)
    for piggybacking on the tile-checkpoint write pass."""
    tbl = _stats_batch(batch)
    row = tbl.to_pylist()[0]
    return row


def partial_stats_side(a):
    """Side-channel stats row from a pre-zeroed float64 batch array
    (shared with the candidate side channel — one conversion per
    batch)."""
    return _part_to_row(partial_stats_from_zeroed(a))


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

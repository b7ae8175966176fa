"""Distributed linear algebra over an embedding column: exact Gram /
covariance partials and PCA (training-data pipeline ops: whitening,
dimensionality reduction before ANN/clustering, spectral diagnostics —
engine-new, no reference analogue; the reference's closest shape is the
MNF covariance accumulation it delegates to pysptools, reimplemented
distributed in stages/mnf.py for the raster path).

Scale shape: the Gram matrix is a textbook associative reduction —
each batch contributes one d x d int64 partial (computed as a single
matmul over the batch), the shuffle carries d^2 fixed-width rows per
batch (never an embedding), and the final ``groupby(i, j)`` merge is
O(d^2) regardless of corpus size. PCA = Gram reduce + an O(d^3) driver
``eigh`` — the corpus is never materialized.

EXACTNESS CONTRACT: embeddings are quantized to fixed point
(``floor(x * 2^16)`` int64) BEFORE any accumulation, so partials are
integers and the reduced Gram is bit-identical at every parallelism —
and a DuckDB oracle can replay it exactly (float32 -> float64 is
exact, * 2^16 is exact, floor is exact, integer sums are
order-independent). Overflow headroom: |q| <= 2^16 * max|x|; for unit-
scale embeddings the int64 sum holds ~2^30 rows per (i, j) cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

FIXED_POINT_SCALE = 1 << 16


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(n, d) float64 from a list<float> column, zero-copy flatten."""
    lists = batch[col].combine_chunks()
    values = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    n = len(lists)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    d = len(values) // n
    return values.astype(np.float64).reshape(n, d)


def make_gram_partial(col="embedding", scale=FIXED_POINT_SCALE):
    """Stage A: one batch -> d^2 rows (i, j, g, n) of int64 Gram
    partials over the fixed-point-quantized embeddings (plus the batch
    row count riding on the (0, 0) cell's ``n`` for the mean path)."""

    def partial(batch: pa.Table) -> pa.Table:
        X = _batch_matrix(batch, col)
        n, d = X.shape
        if n == 0:
            return pa.table({
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "g": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
        q = np.floor(X * scale).astype(np.int64)
        G = q.T @ q                      # (d, d) int64 — exact
        colsum = q.sum(axis=0)           # (d,) int64 — exact
        ii, jj = np.meshgrid(np.arange(d, dtype=np.int64),
                             np.arange(d, dtype=np.int64), indexing="ij")
        nvec = np.zeros(d * d, dtype=np.int64)
        nvec[0] = n
        svec = np.zeros(d * d, dtype=np.int64)
        svec[:d] = colsum               # row i=0 carries the sums
        return pa.table({
            "i": pa.array(ii.ravel()), "j": pa.array(jj.ravel()),
            "g": pa.array(G.ravel()), "s": pa.array(svec),
            "n": pa.array(nvec)})

    return partial


def embedding_gram(ds, col="embedding", scale=FIXED_POINT_SCALE):
    """Exact distributed Gram (uncentered second moment) of the
    fixed-point-quantized embedding column. Returns a Dataset of d^2
    rows (i, j, gram:int64) plus side columns ``s_sum`` (the column sum
    vector on rows i = 0) and ``n_rows`` (total count on cell (0, 0)).
    """
    return ds.map_batches(make_gram_partial(col, scale),
                          batch_format="pyarrow") \
        .groupby(["i", "j"]).aggregate(
            Sum("g", alias_name="gram"),
            Sum("s", alias_name="s_sum"),
            Sum("n", alias_name="n_rows"))


def gram_to_arrays(gram_df):
    """Driver helper: the d^2-row Gram table -> (G int64 (d, d),
    colsum int64 (d,), n int)."""
    d = int(gram_df["i"].max()) + 1
    G = np.zeros((d, d), dtype=np.int64)
    G[gram_df["i"].to_numpy(), gram_df["j"].to_numpy()] = \
        gram_df["gram"].to_numpy()
    s = np.zeros(d, dtype=np.int64)
    row0 = gram_df[gram_df["i"] == 0]
    s[row0["j"].to_numpy()] = row0["s_sum"].to_numpy()
    n = int(gram_df.loc[(gram_df["i"] == 0) & (gram_df["j"] == 0),
                        "n_rows"].iloc[0])
    return G, s, n


def pca_fit(ds, col="embedding", k=None, scale=FIXED_POINT_SCALE):
    """Distributed PCA: one streaming Gram pass + O(d^3) driver eigh
    on the exact integer-reduced covariance. Returns (components
    (k, d) float64 rows = principal axes, eigvals (k,) descending,
    mean (d,)). Deterministic at every parallelism because the reduced
    integer Gram is. Component SIGN is fixed by making each component's
    largest-|coefficient| entry positive."""
    g = embedding_gram(ds, col, scale).to_pandas()
    G, s, n = gram_to_arrays(g)
    mean_q = s / n                            # quantized units
    cov = (G / n - np.outer(mean_q, mean_q)) / (scale * scale)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    comps = V.T
    flip = comps[np.arange(len(comps)),
                 np.abs(comps).argmax(axis=1)] < 0
    comps[flip] *= -1.0
    if k is not None:
        comps, w = comps[:k], w[:k]
    return comps, w, (mean_q / scale)


def pca_project(ds, components, mean, col="embedding",
                id_col="vec_id"):
    """Map-only projection onto broadcast principal axes: returns a
    Dataset (id, pc0..pc{k-1}) — the downstream shape for whitened ANN
    / clustering. Components travel by closure capture (small, ray.put
    semantics via task args)."""
    C = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)

    def project(batch: pa.Table) -> pa.Table:
        X = _batch_matrix(batch, col)
        ids = batch[id_col]
        if X.shape[0] == 0:
            cols = {id_col: ids}
            for k_ in range(C.shape[0]):
                cols["pc%d" % k_] = pa.array([], pa.float64())
            return pa.table(cols)
        Y = (X - mu) @ C.T
        cols = {id_col: ids}
        for k_ in range(C.shape[0]):
            cols["pc%d" % k_] = pa.array(Y[:, k_])
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


COMP_SCALE = 1 << 20    # fixed-point scale for broadcast components


def pca_components_fixed(ds, k=4, col="embedding",
                         scale=FIXED_POINT_SCALE,
                         comp_scale=COMP_SCALE):
    """(Cq, s, n): the top-``k`` principal axes quantized to
    ``floor(c * comp_scale)`` int64, plus the exact integer column-sum
    vector and row count — everything the EXACT projection needs.
    The eigh runs on the float64 covariance derived from the reduced
    INTEGER Gram, so the matrix fed to LAPACK is bit-identical at any
    parallelism and a single-machine replay reproduces Cq exactly."""
    g = embedding_gram(ds, col, scale).to_pandas()
    G, s, n = gram_to_arrays(g)
    mean_q = s / n
    cov = (G / n - np.outer(mean_q, mean_q)) / (scale * scale)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    comps = V[:, order].T
    flip = comps[np.arange(len(comps)),
                 np.abs(comps).argmax(axis=1)] < 0
    comps[flip] *= -1.0
    Cq = np.floor(comps[:k] * comp_scale).astype(np.int64)
    return Cq, s, n


def pca_project_exact(ds, k=4, col="embedding", id_col="vec_id",
                      scale=FIXED_POINT_SCALE, comp_scale=COMP_SCALE):
    """EXACT fixed-point PCA projection: one distributed Gram pass →
    driver eigh → a broadcast map-only pass computing

        pj_c = Σ_d (n·q_d − s_d) · Cq[c, d]        (all int64)

    i.e. the centered projection scaled by n·scale·comp_scale, floored
    to integers BEFORE any accumulation, so the output hash-checks
    bit-for-bit against a single-machine replay at any partitioning
    (the engine's integer-ingredients discipline; the float PCA path
    is :func:`pca_fit` / :func:`pca_project`). Overflow headroom:
    |n·q| ≤ n·2^16·max|x| and the d-term dot adds log2(d) bits —
    int64 holds ~2^20 rows at unit-scale embeddings; beyond that,
    rescale or use the float path (documented contract, asserted)."""
    Cq, s, n = pca_components_fixed(ds, k, col, scale, comp_scale)
    assert n < (1 << 20), \
        "pca_project_exact: n too large for int64 exactness; " \
        "use pca_project (float path)"
    CqT = Cq.T.copy()

    def project(batch: pa.Table) -> pa.Table:
        X = _batch_matrix(batch, col)
        ids = batch[id_col]
        if X.shape[0] == 0:
            cols = {id_col: ids}
            for c in range(k):
                cols["pj%d" % c] = pa.array([], pa.int64())
            return pa.table(cols)
        q = np.floor(X * scale).astype(np.int64)
        Y = (n * q - s[None, :]) @ CqT
        cols = {id_col: ids}
        for c in range(k):
            cols["pj%d" % c] = pa.array(Y[:, c])
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")

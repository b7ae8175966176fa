"""Distributed k-means clustering over an embedding column (training-
data pipeline op: topic/modality bucketing, IVF coarse quantizers —
`stages/ann.py:ivf_topk` uses the same Lloyd structure for its inverted
lists; engine-new, no reference analogue).

Scale shape: every Lloyd iteration is ONE streaming ``map_batches``
pass emitting k partial (count, sum) rows per batch — the driver merge
is O(k·d) regardless of corpus size, centroids are broadcast by value,
and nothing materializes the dataset. Each iteration re-executes the
upstream read (the Ray Data re-read tradeoff); pass
``materialize=True`` to pin the (column-pruned) input in the object
store once when running many iterations over a corpus that fits.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _emb_matrix(df: pd.DataFrame, col: str) -> np.ndarray:
    return np.array([np.asarray(v, dtype=np.float64)
                     for v in df[col]], dtype=np.float64)


def exact_assign(X, C):
    """(n,) argmin_c ||x - c||² computed in the EXACT expanded-per-pair
    form (no ||x||²−2x·c+||c||² trick): bit-stable against an oracle
    that evaluates sqrt(sum((x-c)²)) per pair. Ties → lowest index."""
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1), d2


def seeded_init(ds, col="embedding", id_col="vec_id", k=8):
    """Deterministic, batching-invariant init: the k rows with the
    smallest blake2b(id) digests (a seeded uniform draw computable as a
    distributed partial top-k — no driver scan)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.blake2b(str(int(i)).encode(),
                             digest_size=8).hexdigest()
             for i in df[id_col]]
        out = pd.DataFrame({"h": h, id_col: df[id_col],
                            col: df[col]})
        return out.sort_values("h").head(k)

    top = ds.map_batches(partial, batch_format="pandas").to_pandas()\
        .sort_values("h").head(k)
    return _emb_matrix(top, col)


def farthest_first_init(ds, col="embedding", id_col="vec_id", k=8):
    """Deterministic farthest-first (Gonzalez) init: the smallest-hash
    row seeds the set, then each next centroid is the point maximizing
    its distance to the chosen set (argmax with lowest-id tiebreak —
    batching-invariant). k-1 cheap passes, each a per-batch argmax row;
    spreads the seeds across well-separated modes where a uniform draw
    routinely doubles one mode and merges two others."""
    C = seeded_init(ds, col, id_col, 1)

    for _ in range(k - 1):
        Cb = np.asarray(C, dtype=np.float64)

        def far(df: pd.DataFrame) -> pd.DataFrame:
            X = _emb_matrix(df, col)
            d2 = ((X[:, None, :] - Cb[None, :, :]) ** 2).sum(axis=2)\
                .min(axis=1)
            order = np.lexsort((df[id_col].to_numpy(), -d2))
            i = order[0]
            return pd.DataFrame({
                id_col: [df[id_col].iloc[i]], "d2": [float(d2[i])],
                col: [df[col].iloc[i]]})

        cand = ds.map_batches(far, batch_format="pandas").to_pandas()
        cand = cand.sort_values(["d2", id_col],
                                ascending=[False, True]).iloc[0]
        C = np.vstack([C, np.asarray(cand[col], dtype=np.float64)])
    return C


def kmeans_fit(ds, col="embedding", id_col="vec_id", k=8, iters=10,
               materialize=False, init="farthest"):
    """Distributed Lloyd's algorithm. Returns (centroids (k, d) float64,
    inertia history list). Empty clusters keep their previous centroid.
    Deterministic up to float-merge order (partial sums are merged in
    block order; see tests for the pinned tolerance). ``init``:
    "farthest" (default; k-1 extra passes) or "hash" (one pass, a
    uniform seeded draw)."""
    lean = ds.map_batches(lambda t: t.select([id_col, col]),
                          batch_format="pyarrow")
    if materialize:
        lean = lean.materialize()
    C = farthest_first_init(lean, col, id_col, k) if \
        init == "farthest" else seeded_init(lean, col, id_col, k)
    history = []
    for _ in range(iters):
        Cb = C.copy()

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            X = _emb_matrix(df, col)
            a, d2 = exact_assign(X, Cb)
            rows = {"cid": [], "n": [], "s": [], "inertia": []}
            for c in range(Cb.shape[0]):
                sel = a == c
                rows["cid"].append(c)
                rows["n"].append(int(sel.sum()))
                rows["s"].append(X[sel].sum(axis=0).tolist())
                rows["inertia"].append(
                    float(d2[sel, c].sum()) if sel.any() else 0.0)
            return pd.DataFrame(rows)

        parts = lean.map_batches(partial,
                                 batch_format="pandas").to_pandas()
        agg_n = parts.groupby("cid")["n"].sum()
        inertia = float(parts["inertia"].sum())
        history.append(inertia)
        newC = C.copy()
        for c in range(k):
            n = int(agg_n.get(c, 0))
            if n:
                s = np.sum([np.asarray(v) for v in
                            parts[parts["cid"] == c]["s"]], axis=0)
                newC[c] = s / n
        C = newC
    return C, history


def assign(ds, centroids, col="embedding", id_col="vec_id"):
    """Per-row nearest-centroid assignment (broadcast centroid matrix,
    exact per-pair distances, lowest-index tiebreak). Returns a Dataset
    of (id_col, cluster_id int64)."""
    C = np.asarray(centroids, dtype=np.float64)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        X = _emb_matrix(df, col)
        a, _ = exact_assign(X, C)
        return pd.DataFrame({id_col: df[id_col],
                             "cluster_id": a.astype(np.int64)})

    return ds.map_batches(fn, batch_format="pandas")


def assign_first_k_sql(k=8):
    """DuckDB oracle for ``assign`` with centroids = the embeddings of
    vec_id < k (fixed, data-defined — lets the oracle reconstruct the
    exact centroid values with a self-join instead of literals)."""
    return f"""
        WITH cent AS (
          SELECT vec_id AS cid, embedding AS cemb
          FROM embeddings WHERE vec_id < {k}),
        d AS (
          SELECT e.vec_id, c.cid,
                 list_distance(e.embedding, c.cemb) AS dist,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_distance(e.embedding, c.cemb), c.cid)
                   AS rn
          FROM embeddings e CROSS JOIN cent c)
        SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id
        FROM d WHERE rn = 1"""

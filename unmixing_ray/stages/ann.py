"""Similarity search over the embeddings table (list<float> column).

- ``brute_force_topk``: the exact baseline — the query matrix is broadcast
  (tiny), each batch computes one vectorized matmul of its embeddings
  against ALL queries, keeps a per-batch top-k, and the driver merges the
  small partials. No shuffle; one streaming pass.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets
  (sign-bit codes), probing only the query's bucket (+ multi-probe
  neighbors at Hamming distance 1). Approximate; same output schema.
- ``cosine_near_dup_pairs``: embedding-cosine near-duplicate pairs via
  the same LSH buckets (exact verify inside buckets).

Ranking note: DuckDB's ``list_cosine_similarity`` computes in float32
while numpy accumulates in float64 — similarities can differ in the 6th
decimal. Compared outputs therefore rank on ``floor(sim * 1e4)`` (ties
broken by vec_id, identical in both engines) and omit the raw similarity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum


def _batch_embeddings(df):
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def _normalize(M):
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def get_query_matrix(embeddings_ds, query_ids):
    """Gather the query vectors (tiny) from the dataset (pyarrow filter:
    empty pandas object batches confuse Ray's block sizing)."""
    import pyarrow as pa_
    import pyarrow.compute as pc_
    want_arr = pa_.array(sorted(int(q) for q in query_ids), pa_.int64())

    def pick(t):
        m = pc_.is_in(t["vec_id"].cast(pa_.int64()), value_set=want_arr)
        return t.filter(m)

    rows = embeddings_ds.map_batches(pick, batch_format="pyarrow")\
        .to_pandas()
    rows = rows.sort_values("vec_id")
    return (rows["vec_id"].to_numpy(),
            np.stack(rows["embedding"].to_numpy()).astype(np.float64))


def brute_force_topk(embeddings_ds, query_ids=(0, 1, 2, 3, 4), k=10):
    """Exact cosine top-k for each query id.
    Returns pandas (query_id, rnk, vec_id), rank 0-based,
    self-matches excluded."""
    qids, Q = get_query_matrix(embeddings_ds, query_ids)
    Qn = _normalize(Q)

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        M = _batch_embeddings(df)
        sims = _normalize(M) @ Qn.T                 # (n, q)
        vec_ids = df["vec_id"].to_numpy()
        out = {"query_id": [], "vec_id": [], "sim_u4": []}
        for j in range(len(qids)):
            s = sims[:, j]
            keep = vec_ids != qids[j]
            su4 = np.floor(s * 10_000).astype(np.int64)
            order = np.lexsort((vec_ids[keep], -su4[keep]))[:k]
            sel = np.nonzero(keep)[0][order]
            out["query_id"].extend([int(qids[j])] * len(sel))
            out["vec_id"].extend(vec_ids[sel].tolist())
            out["sim_u4"].extend(su4[sel].tolist())
        return pd.DataFrame(out)

    partials = embeddings_ds.map_batches(
        partial_topk, batch_format="pandas").to_pandas()
    partials = partials.sort_values(
        ["query_id", "sim_u4", "vec_id"],
        ascending=[True, False, True])
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rnk"] = out.groupby("query_id").cumcount()
    return out[["query_id", "rnk", "vec_id"]].reset_index(drop=True)


def brute_force_topk_sql(query_ids=(0, 1, 2, 3, 4), k=10):
    qlist = ", ".join(str(int(q)) for q in query_ids)
    return f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS qe FROM embeddings
          WHERE vec_id IN ({qlist})),
        s AS (
          SELECT q.query_id, e.vec_id,
                 CAST(floor(list_cosine_similarity(e.embedding, q.qe)
                            * 10000) AS BIGINT) AS sim_u4
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> q.query_id),
        r AS (
          SELECT query_id, vec_id, sim_u4,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim_u4 DESC, vec_id) AS rn
          FROM s)
        SELECT CAST(query_id AS BIGINT) AS query_id,
               CAST(rn - 1 AS BIGINT) AS rnk,
               CAST(vec_id AS BIGINT) AS vec_id
        FROM r WHERE rn <= {k}"""


def knn_graph(embeddings_ds, k=5, max_rows=200_000):
    """Exact cosine kNN GRAPH build (every vector's top-k neighbors,
    self excluded) — the all-queries generalization of
    ``brute_force_topk`` and the substrate of SemDeDup / cluster-
    assignment / UMAP-style pipelines. Ranking on floor(sim·1e4) with
    the vec_id tiebreak (module docstring: DuckDB float32 vs numpy
    float64 drift).

    Scale shape: brute force is O(n²) by definition, so like
    ``cosine_near_dup_pairs`` the operator REFUSES tables beyond
    ``max_rows`` (loudly — the IVF/LSH paths are the scale story);
    under the guard the normalized corpus matrix broadcasts once via
    ``ray.put`` and one stateless pass computes each batch's rows ×
    corpus matmul with a complete per-row top-k — no shuffle, no
    merge. Returns a Dataset of (vec_id, rnk, nbr_id)."""
    import ray

    n = embeddings_ds.count()
    if n > max_rows:
        raise ValueError(
            f"knn_graph is brute-force O(n²); {n} rows > max_rows="
            f"{max_rows}. Use ivf_topk/lsh_topk for large tables.")
    allrows = embeddings_ds.select_columns(["vec_id", "embedding"])\
        .to_pandas().sort_values("vec_id")
    ids = allrows["vec_id"].to_numpy(np.int64)
    Mn = _normalize(np.stack(allrows["embedding"].to_numpy())
                    .astype(np.float64))
    ref = ray.put((ids, Mn))

    def batch_knn(df: pd.DataFrame) -> pd.DataFrame:
        cids, CM = ray.get(ref)
        B = _normalize(_batch_embeddings(df))
        sims = B @ CM.T                              # (b, n)
        su4 = np.floor(sims * 10_000).astype(np.int64)
        vids = df["vec_id"].to_numpy(np.int64)
        out = {"vec_id": [], "rnk": [], "nbr_id": []}
        for i in range(len(vids)):
            keep = cids != vids[i]
            order = np.lexsort((cids[keep], -su4[i][keep]))[:k]
            sel = np.nonzero(keep)[0][order]
            out["vec_id"].extend([int(vids[i])] * len(sel))
            out["rnk"].extend(range(len(sel)))
            out["nbr_id"].extend(cids[sel].tolist())
        return pd.DataFrame(out).astype("int64")

    return embeddings_ds.select_columns(["vec_id", "embedding"])\
        .map_batches(batch_knn, batch_format="pandas")


def knn_graph_sql(k=5):
    return f"""
        WITH s AS (
          SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
                 CAST(floor(list_cosine_similarity(a.embedding,
                                                   b.embedding)
                            * 10000) AS BIGINT) AS su4
          FROM embeddings a JOIN embeddings b
            ON a.vec_id <> b.vec_id),
        r AS (SELECT vec_id, nbr_id, su4,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY su4 DESC, nbr_id)
                       AS rn
              FROM s)
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               CAST(rn - 1 AS BIGINT) AS rnk,
               CAST(nbr_id AS BIGINT) AS nbr_id
        FROM r WHERE rn <= {k}"""


def _hyperplanes(dim, nbits, seed=4321):
    rng = np.random.default_rng(np.random.SeedSequence([seed, dim, nbits]))
    return rng.normal(size=(nbits, dim))


def _codes(M, planes):
    bits = (M @ planes.T) > 0
    code = np.zeros(len(M), dtype=np.int64)
    for b in range(planes.shape[0]):
        code |= bits[:, b].astype(np.int64) << b
    return code


def lsh_topk(embeddings_ds, query_ids=(0, 1, 2, 3, 4), k=10, nbits=4,
             num_tables=12, seed=4321, probe_hamming=1):
    """Approximate top-k via a multi-table bucket-partitioned LSH index.

    Scale path, for real this time (round 1 full-scanned every batch):
    1. the code stage assigns each vector its sign-bit bucket in each of
       ``num_tables`` independent hyperplane tables and FILTERS to the
       probed buckets (query bucket + Hamming-``probe_hamming`` ring per
       table) — non-probed vectors never leave their block, and only
       (table, bucket, vec_id, embedding) rows travel;
    2. ``groupby(table, bucket)`` makes the bucket the shuffle/partition
       key; each bucket group computes its local per-query top-k
       independently;
    3. the driver dedups + merges the tiny per-bucket partials.

    Multi-table OR-amplification is what buys recall on weakly-similar
    corpora (single-table sign-LSH recall collapses when neighbor cosine
    is ~0.3: per-bit collision ~0.6 → 0.6^nbits per bucket).
    """
    qids, Q = get_query_matrix(embeddings_ds, query_ids)
    Qn = _normalize(Q)
    dim = Q.shape[1]
    tables = [_hyperplanes(dim, nbits, seed + 1000 * t)
              for t in range(num_tables)]
    # per table: probe set per query + the union (the stage filter)
    probe_sets = []     # [table][query] -> set of codes
    all_probes = []     # [table] -> sorted union
    for t in range(num_tables):
        qcodes = _codes(Qn, tables[t])
        per_q = []
        for c in qcodes:
            probes = {int(c)}
            frontier = [int(c)]
            for _ in range(probe_hamming):
                nxt = []
                for v in frontier:
                    for b in range(nbits):
                        w = v ^ (1 << b)
                        if w not in probes:
                            probes.add(w)
                            nxt.append(w)
                frontier = nxt
            per_q.append(probes)
        probe_sets.append(per_q)
        all_probes.append(sorted(set().union(*per_q)))

    def code_stage(df: pd.DataFrame) -> pd.DataFrame:
        M = _batch_embeddings(df)
        Mn = _normalize(M)
        vec_ids = df["vec_id"].to_numpy()
        parts = []
        for t in range(num_tables):
            codes = _codes(Mn, tables[t])
            keep = np.isin(codes, all_probes[t])
            if not keep.any():
                continue
            parts.append(pd.DataFrame({
                "table": pd.Series(np.full(keep.sum(), t), dtype="int64"),
                "bucket": pd.Series(codes[keep], dtype="int64"),
                "vec_id": pd.Series(vec_ids[keep], dtype="int64"),
                "embedding": df["embedding"]
                .iloc[np.nonzero(keep)[0]].reset_index(drop=True),
            }))
        if not parts:
            return pd.DataFrame({
                "table": pd.Series([], dtype="int64"),
                "bucket": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "embedding": pd.Series([], dtype=object)})
        return pd.concat(parts, ignore_index=True)

    coded = embeddings_ds.map_batches(code_stage, batch_format="pandas")

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        t = int(g["table"].iloc[0])
        bucket = int(g["bucket"].iloc[0])
        Mn = _normalize(_batch_embeddings(g))
        vec_ids = g["vec_id"].to_numpy()
        out = {"query_id": [], "vec_id": [], "sim_u4": []}
        for j in range(len(qids)):
            if bucket not in probe_sets[t][j]:
                continue
            mask = vec_ids != qids[j]
            if not mask.any():
                continue
            s = Mn[mask] @ Qn[j]
            su4 = np.floor(s * 10_000).astype(np.int64)
            ids = vec_ids[mask]
            order = np.lexsort((ids, -su4))[:k]
            out["query_id"].extend([int(qids[j])] * len(order))
            out["vec_id"].extend(ids[order].tolist())
            out["sim_u4"].extend(su4[order].tolist())
        return pd.DataFrame(out)

    partials = coded.groupby(["table", "bucket"]).map_groups(
        bucket_topk, batch_format="pandas").to_pandas()
    if not len(partials):
        return pd.DataFrame({"query_id": [], "rnk": [], "vec_id": []})
    # a vector can surface from several tables: dedup before ranking
    partials = partials.drop_duplicates(["query_id", "vec_id"])
    partials = partials.sort_values(
        ["query_id", "sim_u4", "vec_id"], ascending=[True, False, True])
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rnk"] = out.groupby("query_id").cumcount()
    return out[["query_id", "rnk", "vec_id"]].reset_index(drop=True)


def ivf_topk(embeddings_ds, query_ids=(0, 1, 2, 3, 4), k=10,
             n_centroids=16, n_probe=12, train_sample=512, iters=10,
             seed=777):
    """Approximate top-k via an IVF (inverted-file) index — the
    k-means-bucketed scale path complementing the LSH one.

    1. a deterministic strided sample trains a seeded numpy Lloyd
       k-means on normalized vectors (the coarse quantizer — tiny,
       broadcast by value);
    2. the map stage assigns each vector its nearest-centroid bucket
       and FILTERS to the union of the queries' ``n_probe`` closest
       buckets — non-probed vectors never leave their block;
    3. ``groupby(bucket)`` partitions by inverted list; each list
       computes its local per-query top-k; the driver merges the tiny
       partials.

    Same output schema as brute_force_topk. Recall note: IVF recall is
    a function of the corpus's cluster structure — on the synthetic
    unclustered embeddings (neighbor cosine ~0.3, near-uniform centroid
    membership) the default 12-of-16 probe reaches ~0.94; recall >= 0.9
    is pinned in tests. On genuinely clustered corpora (the case IVF is
    built for) far fewer probes suffice. The LSH path is the
    oracle-checked variant.
    """
    qids, Q = get_query_matrix(embeddings_ds, query_ids)
    Qn = _normalize(Q)
    n = embeddings_ds.count()
    stride = max(1, n // train_sample)

    import pyarrow as pa_
    import pyarrow.compute as pc_

    def pick_train(t):
        ids = t["vec_id"].to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        m = pa_.array(ids % stride == 0, pa_.bool_())
        return t.select(["vec_id", "embedding"]).filter(m)

    train = embeddings_ds.map_batches(pick_train,
                                      batch_format="pyarrow").to_pandas()
    train = train.sort_values("vec_id")
    T = _normalize(np.stack(train["embedding"].to_numpy())
                   .astype(np.float64))
    rng = np.random.default_rng(np.random.SeedSequence([seed,
                                                        n_centroids]))
    C = T[rng.choice(len(T), size=min(n_centroids, len(T)),
                     replace=False)]
    for _ in range(iters):
        assign = (T @ C.T).argmax(axis=1)
        newC = np.vstack([
            T[assign == c].mean(axis=0) if (assign == c).any() else C[c]
            for c in range(len(C))])
        C = _normalize(newC)
    q_probe = np.argsort(-(Qn @ C.T), axis=1)[:, :n_probe]   # (q, probe)
    probed = np.unique(q_probe)

    def assign_stage(df: pd.DataFrame) -> pd.DataFrame:
        M = _normalize(_batch_embeddings(df))
        bucket = (M @ C.T).argmax(axis=1)
        keep = np.isin(bucket, probed)
        return pd.DataFrame({
            "bucket": pd.Series(bucket[keep], dtype="int64"),
            "vec_id": pd.Series(df["vec_id"].to_numpy()[keep],
                                dtype="int64"),
            "embedding": df["embedding"]
            .iloc[np.nonzero(keep)[0]].reset_index(drop=True)})

    coded = embeddings_ds.map_batches(assign_stage, batch_format="pandas")

    def list_topk(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        Mn = _normalize(_batch_embeddings(g))
        vec_ids = g["vec_id"].to_numpy()
        out = {"query_id": [], "vec_id": [], "sim_u4": []}
        for j in range(len(qids)):
            if bucket not in q_probe[j]:
                continue
            mask = vec_ids != qids[j]
            if not mask.any():
                continue
            s = Mn[mask] @ Qn[j]
            su4 = np.floor(s * 10_000).astype(np.int64)
            ids = vec_ids[mask]
            order = np.lexsort((ids, -su4))[:k]
            out["query_id"].extend([int(qids[j])] * len(order))
            out["vec_id"].extend(ids[order].tolist())
            out["sim_u4"].extend(su4[order].tolist())
        return pd.DataFrame(out)

    partials = coded.groupby("bucket").map_groups(
        list_topk, batch_format="pandas").to_pandas()
    if not len(partials):
        return pd.DataFrame({"query_id": [], "rnk": [], "vec_id": []})
    partials = partials.sort_values(
        ["query_id", "sim_u4", "vec_id"], ascending=[True, False, True])
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rnk"] = out.groupby("query_id").cumcount()
    return out[["query_id", "rnk", "vec_id"]].reset_index(drop=True)


def cosine_near_dup_exact(embeddings_ds, threshold=0.95,
                          max_rows=200_000):
    """Exact embedding-cosine near-dup pairs: the embedding table's
    vector side is broadcast once (ray.put) and every batch computes a
    vectorized batch×all similarity block, emitting (vec_a < vec_b)
    pairs. Exact counterpart of the SQL self-join oracle and QUARANTINED
    to oracle scale: O(N^2) compute with the whole table broadcast, so it
    refuses tables above ``max_rows`` — use ``cosine_near_dup_pairs``
    (LSH buckets) as the production scale path."""
    import ray
    n = embeddings_ds.count()
    if n > max_rows:
        raise ValueError(
            "cosine_near_dup_exact is the O(N^2) oracle baseline and is "
            "capped at %d rows (got %d); use cosine_near_dup_pairs for "
            "large tables" % (max_rows, n))
    all_rows = embeddings_ds.to_pandas()
    all_ids = all_rows["vec_id"].to_numpy()
    all_M = _normalize(np.stack(all_rows["embedding"].to_numpy())
                       .astype(np.float64))
    ref = ray.put((all_ids, all_M))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_all, M_all = ray.get(ref)
        M = _normalize(_batch_embeddings(df))
        ids = df["vec_id"].to_numpy()
        sims = M @ M_all.T
        rows = {"vec_a": [], "vec_b": []}
        for i in range(len(ids)):
            mask = (sims[i] >= threshold) & (ids_all > ids[i])
            sel = np.nonzero(mask)[0]
            rows["vec_a"].extend([int(ids[i])] * len(sel))
            rows["vec_b"].extend(ids_all[sel].tolist())
        return pd.DataFrame({
            "vec_a": pd.Series(rows["vec_a"], dtype="int64"),
            "vec_b": pd.Series(rows["vec_b"], dtype="int64")})

    out = embeddings_ds.map_batches(pairs, batch_format="pandas")\
        .to_pandas()
    if not len(out):
        # keep the schema on an empty result (Ray drops columns of a
        # fully-empty dataset on to_pandas)
        out = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                            "vec_b": pd.Series([], dtype="int64")})
    return out


def cosine_near_dup_pairs(embeddings_ds, threshold=0.95, nbits=6,
                          seed=4321, num_tables=8):
    """Embedding-cosine near-duplicate pairs: multi-table LSH-bucket
    groupby, exact all-pairs verify within buckets (buckets are small by
    construction), cross-table dedup via a (vec_a, vec_b) groupby.
    Returns (vec_a, vec_b, sim_u6) with vec_a < vec_b.

    ``num_tables`` OR-amplification is what buys recall: a single
    sign-LSH table misses a cosine-0.99 pair with probability
    1-(1-θ/π)^nbits ≈ 0.24 at nbits=6; eight independent tables push
    the miss rate below 1e-4 (round 2 ran one table — vacuous recall)."""
    from ray.data.aggregate import Min
    planes_holder = {}

    def code_stage(df: pd.DataFrame) -> pd.DataFrame:
        M = _batch_embeddings(df)
        dim = M.shape[1]
        if "p" not in planes_holder:
            planes_holder["p"] = [
                _hyperplanes(dim, nbits, seed + 1000 * t)
                for t in range(num_tables)]
        Mn = _normalize(M)
        parts = []
        for t in range(num_tables):
            codes = _codes(Mn, planes_holder["p"][t])
            parts.append(pd.DataFrame({
                "table": pd.Series(np.full(len(codes), t), dtype="int64"),
                "bucket": pd.Series(codes, dtype="int64"),
                "vec_id": df["vec_id"],
                "embedding": df["embedding"],
            }))
        return pd.concat(parts, ignore_index=True)

    coded = embeddings_ds.map_batches(code_stage, batch_format="pandas")

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"vec_a": [], "vec_b": [], "sim_u6": []}
        if len(g) >= 2:
            g = g.sort_values("vec_id")
            M = _normalize(_batch_embeddings(g))
            ids = g["vec_id"].to_numpy()
            sims = M @ M.T
            iu = np.triu_indices(len(ids), 1)
            s = sims[iu]
            keep = s >= threshold
            rows["vec_a"] = ids[iu[0][keep]].tolist()
            rows["vec_b"] = ids[iu[1][keep]].tolist()
            rows["sim_u6"] = np.floor(
                s[keep] * 1_000_000).astype(np.int64).tolist()
        return pd.DataFrame({
            "vec_a": pd.Series(rows["vec_a"], dtype="int64"),
            "vec_b": pd.Series(rows["vec_b"], dtype="int64"),
            "sim_u6": pd.Series(rows["sim_u6"], dtype="int64")})

    pairs = coded.groupby(["table", "bucket"]).map_groups(
        bucket_verify, batch_format="pandas")
    # the same pair can surface from several tables: distributed dedup
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(
        Min("sim_u6", alias_name="sim_u6"))


def semdedup(embeddings_ds, centroids, threshold=0.45,
             col="embedding", id_col="vec_id"):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by CLUSTERING FIRST, then exact cosine dedup only
    WITHIN clusters — the cluster partition is what bounds the O(n²):
    each group holds n/k vectors, so the within-group similarity block
    is (n/k)² and k scales with the corpus to keep groups
    worker-sized (the production path feeds ``cluster.kmeans_fit``
    centroids; the oracle query uses data-defined centroids so the
    assignment replays in SQL).

    One broadcast-assign pass (centroid matrix shipped once) tags each
    vector; ONE groupby(cluster_id) exchange co-locates each cluster;
    the verdict is keep-min-id: vector b is dropped iff some a < b in
    the same cluster has cos(a, b) ≥ threshold, and ``dup_of`` is the
    smallest such a (deterministic, batching-invariant). Returns a
    Dataset of (vec_id, cluster_id, keep 0/1, dup_of, -1 when kept).
    Cross-cluster near-dups are invisible BY DESIGN — that recall loss
    vs :func:`cosine_near_dup_exact` is the documented SemDeDup
    trade-off, not a bug."""
    from .cluster import _emb_matrix, exact_assign
    C = np.asarray(centroids, dtype=np.float64)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        X = _emb_matrix(df, col)
        a, _ = exact_assign(X, C)
        return pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            "cluster_id": a.astype(np.int64),
            col: df[col]})

    assigned = embeddings_ds.map_batches(tag, batch_format="pandas")

    def verdicts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy(np.int64)
        M = _normalize(_emb_matrix(g, col))
        sims = M @ M.T
        dup = np.triu(sims >= threshold, 1)     # dup[i, j]: i < j hits j
        hit = dup.any(axis=0)
        first = dup.argmax(axis=0)              # smallest i (row order)
        return pd.DataFrame({
            id_col: ids,
            "cluster_id": g["cluster_id"].to_numpy(np.int64),
            "keep": (~hit).astype(np.int64),
            "dup_of": np.where(hit, ids[first], -1).astype(np.int64)})

    return assigned.groupby("cluster_id").map_groups(
        verdicts, batch_format="pandas")


def semdedup_first_k_sql(k=8, threshold=0.45):
    """DuckDB oracle for :func:`semdedup` with the vec_id < k
    data-defined centroids (assignment replay = the
    ``assign_first_k_sql`` row_number pattern; verdicts = a
    same-cluster lower-id similarity join)."""
    return f"""
        WITH cent AS (
          SELECT vec_id AS cid, embedding AS cemb
          FROM embeddings WHERE vec_id < {k}),
        d AS (
          SELECT e.vec_id, e.embedding, c.cid,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_distance(e.embedding, c.cemb), c.cid)
                   AS rn
          FROM embeddings e CROSS JOIN cent c),
        asg AS (
          SELECT vec_id, embedding, CAST(cid AS BIGINT) AS cluster_id
          FROM d WHERE rn = 1),
        dups AS (
          SELECT b.vec_id,
                 CAST(min(a.vec_id) AS BIGINT) AS dup_of
          FROM asg a JOIN asg b
            ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding)
                >= {threshold}
          GROUP BY b.vec_id)
        SELECT asg.vec_id, asg.cluster_id,
               CAST(CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END
                    AS BIGINT) AS keep,
               CAST(COALESCE(dup.dup_of, -1) AS BIGINT) AS dup_of
        FROM asg LEFT JOIN dups dup ON asg.vec_id = dup.vec_id"""


def quantize_int8(embeddings_ds):
    """Symmetric per-vector int8 quantization — the embedding
    compression step of a scale ANN index (IVF-PQ-style storage: 4x
    smaller vectors through every downstream exchange): per vector,
    ``scale = max(|x|)`` and ``q_i = floor(x_i * 127 / scale)``, all
    arithmetic in float64 so DuckDB's double math replays it exactly.
    Stateless one-pass map; returns integer summaries
    (q_sum, q_l1, n_dims, scale_u6) that pin every quantized value
    through the hash check without shipping list columns."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        M = _batch_embeddings(df)                 # (n, d) float64
        scale = np.abs(M).max(axis=1)
        safe = np.where(scale > 0, scale, 1.0)
        q = np.floor(M * 127.0 / safe[:, None]).astype(np.int64)
        q[scale == 0] = 0
        return pd.DataFrame({
            "vec_id": df["vec_id"].astype(np.int64),
            "q_sum": q.sum(axis=1),
            "q_l1": np.abs(q).sum(axis=1),
            "n_dims": np.full(len(df), M.shape[1], np.int64),
            "scale_u6": np.floor(scale * 1_000_000).astype(np.int64)})

    return embeddings_ds.map_batches(fn, batch_format="pandas")


def quantize_int8_sql():
    """DuckDB oracle for :func:`quantize_int8` (identical float64
    promotion order: abs/max in double, x*127/scale, floor)."""
    return """
        WITH s AS (
          SELECT vec_id,
                 list_transform(embedding,
                                x -> CAST(x AS DOUBLE)) AS e,
                 list_max(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) AS scale
          FROM embeddings),
        q AS (
          SELECT vec_id, scale,
                 CASE WHEN scale > 0 THEN
                   list_transform(e, x -> CAST(floor(x * 127 / scale)
                                               AS BIGINT))
                 ELSE list_transform(e, x -> CAST(0 AS BIGINT))
                 END AS qv,
                 len(e) AS d
          FROM s)
        SELECT vec_id,
               CAST(list_sum(qv) AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(qv, x -> abs(x)))
                    AS BIGINT) AS q_l1,
               CAST(d AS BIGINT) AS n_dims,
               CAST(floor(scale * 1000000) AS BIGINT) AS scale_u6
        FROM q"""


def label_centroids(embeddings_ds, scale_bits=20):
    """Per-label embedding centroid sums — the class-prototype /
    nearest-centroid-classifier build step: per label, the per-dimension
    sum of vectors and the member count. Exactness discipline: each
    float32 coordinate is floored to a fixed-point int
    (``floor(x · 2^scale_bits)``, exact in float64), so the partial
    sums are int64 and associative — bit-identical at any batching, and
    DuckDB replays the identical arithmetic (float summation ORDER
    never matters because no float is ever summed). Combiner: one
    (label, dim, sum, n) row set per batch through the shuffle."""
    scale = float(1 << scale_bits)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        M = _batch_embeddings(df)                     # (n, d) float64
        Q = np.floor(M * scale).astype(np.int64)
        labels = df["label"].to_numpy().astype(np.int64)
        out = {"label": [], "dim": [], "s": [], "n": []}
        for lab in np.unique(labels):
            m = labels == lab
            s = Q[m].sum(axis=0)
            out["label"].extend([int(lab)] * Q.shape[1])
            out["dim"].extend(range(Q.shape[1]))
            out["s"].extend(int(v) for v in s)
            out["n"].extend([int(m.sum())] * Q.shape[1])
        return pd.DataFrame({
            "label": pd.Series(out["label"], dtype="int64"),
            "dim": pd.Series(out["dim"], dtype="int64"),
            "s": pd.Series(out["s"], dtype="int64"),
            "n": pd.Series(out["n"], dtype="int64")})

    merged = embeddings_ds.map_batches(partial, batch_format="pandas") \
        .groupby(["label", "dim"]) \
        .aggregate(Sum("s", alias_name="sum_q"),
                   Sum("n", alias_name="n_vecs"))

    def rename(batch):
        return pa.table({
            "label": batch["label"].cast(pa.int64()),
            "dim": batch["dim"].cast(pa.int64()),
            "sum_q": batch["sum_q"].cast(pa.int64()),
            "n_vecs": batch["n_vecs"].cast(pa.int64())})

    return merged.map_batches(rename, batch_format="pyarrow")


def label_centroids_sql(scale_bits=20):
    """DuckDB oracle for :func:`label_centroids`."""
    scale = 1 << scale_bits
    return f"""
        WITH u AS (
          SELECT label, i - 1 AS dim,
                 CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale})
                      AS BIGINT) AS q
          FROM (SELECT label, embedding,
                       unnest(generate_series(1, len(embedding))) AS i
                FROM embeddings))
        SELECT CAST(label AS BIGINT) AS label, dim,
               CAST(sum(q) AS BIGINT) AS sum_q,
               CAST(count(*) AS BIGINT) AS n_vecs
        FROM u GROUP BY label, dim"""


def pq_assign(embeddings_ds, n_sub=4, k_codes=16):
    """Product-quantization code assignment — the memory-scale ANN
    path (IVF-PQ / ScaNN family): the d-dim embedding splits into
    ``n_sub`` contiguous subspaces and each slice is quantized to the
    nearest of ``k_codes`` codewords, so a vector compresses to
    ``n_sub`` small codes (here 4×4 bits = one int16 per 64-float
    vector, a 128× reduction for the ADC scan stage).

    Codebook discipline = ``kmeans_assign``/``semdedup``: the
    codewords are the DATA-DEFINED vec_id < k_codes embeddings sliced
    per subspace, so the SQL oracle reconstructs them exactly with a
    self-join + list slicing (a trained codebook from
    ``cluster.kmeans_fit`` plugs in the same way but is float-merge-
    order sensitive, hence not the oracle path). Assignment is the
    exact expanded per-pair L2 argmin in float64 with the lowest-cid
    tiebreak (cluster.exact_assign discipline).

    Scale shape: the (k_codes × d) codebook broadcasts by value into
    one stateless ``map_batches`` pass — no shuffle, each batch does
    n_sub small (b, k) distance blocks. Returns (vec_id, code0..,
    packed) with packed = Σ code_m · k^(n_sub−1−m)."""
    head = embeddings_ds.filter(
        lambda r: r["vec_id"] < k_codes).to_pandas() \
        .sort_values("vec_id")
    if len(head) != k_codes:
        raise ValueError(
            f"expected vec_id 0..{k_codes - 1} codebook rows, got "
            f"{len(head)}")
    C = np.stack(head["embedding"].to_numpy()).astype(np.float64)
    d = C.shape[1]
    if d % n_sub:
        raise ValueError(f"dim {d} not divisible by n_sub={n_sub}")
    w = d // n_sub

    def codes(df: pd.DataFrame) -> pd.DataFrame:
        X = _batch_embeddings(df)
        out = {"vec_id": df["vec_id"].to_numpy(np.int64)}
        packed = np.zeros(len(df), dtype=np.int64)
        for m in range(n_sub):
            sl = slice(m * w, (m + 1) * w)
            d2 = ((X[:, None, sl] - C[None, :, sl]) ** 2).sum(axis=2)
            cm = d2.argmin(axis=1).astype(np.int64)  # first = low cid
            out[f"code{m}"] = cm
            packed = packed * k_codes + cm
        out["packed"] = packed
        return pd.DataFrame(out).astype("int64")

    return embeddings_ds.select_columns(["vec_id", "embedding"]) \
        .map_batches(codes, batch_format="pandas")


def pq_assign_sql(n_sub=4, k_codes=16, dim=64):
    w = dim // n_sub
    blocks, joins, packed = [], [], []
    for m in range(n_sub):
        lo, hi = m * w + 1, (m + 1) * w
        blocks.append(f"""
        a{m} AS (
          SELECT vec_id, cid AS code{m} FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_distance(e.embedding[{lo}:{hi}],
                                            c.cemb[{lo}:{hi}]),
                              c.cid) AS rn
            FROM embeddings e CROSS JOIN cent c) WHERE rn = 1)""")
        if m:
            joins.append(f"JOIN a{m} USING (vec_id)")
        packed.append(f"code{m} * {k_codes ** (n_sub - 1 - m)}")
    return f"""
        WITH cent AS (
          SELECT vec_id AS cid, embedding AS cemb
          FROM embeddings WHERE vec_id < {k_codes}),
        {", ".join(blocks)}
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               {", ".join(f"CAST(code{m} AS BIGINT) AS code{m}"
                          for m in range(n_sub))},
               CAST({" + ".join(packed)} AS BIGINT) AS packed
        FROM a0 {" ".join(joins)}"""


def pq_adc_topk(embeddings_ds, query_ids=(0, 1, 2, 3, 4), k=10,
                n_sub=4, k_codes=16):
    """Asymmetric-distance (ADC) top-k over PQ codes — the search
    stage that makes pq_assign useful: each query builds its
    (n_sub × k_codes) lookup table of exact subspace distances once,
    then every database vector is scored from its CODES ONLY (n_sub
    table lookups, never the raw floats). Approximate by construction;
    recall vs brute force is pytest-pinned, the code-assignment half
    is the oracle-checked query. Returns (query_id, rnk, vec_id)."""
    import ray

    head = embeddings_ds.filter(
        lambda r: r["vec_id"] < k_codes).to_pandas() \
        .sort_values("vec_id")
    C = np.stack(head["embedding"].to_numpy()).astype(np.float64)
    qids, Q = get_query_matrix(embeddings_ds, query_ids)
    d = C.shape[1]
    w = d // n_sub
    # LUT[q, m, c] = ||Q[q, m-slice] - C[c, m-slice]||²
    lut = np.stack([
        ((Q[:, None, m * w:(m + 1) * w]
          - C[None, :, m * w:(m + 1) * w]) ** 2).sum(axis=2)
        for m in range(n_sub)], axis=1)
    qids = np.asarray(qids, dtype=np.int64)
    ref = ray.put((qids, lut))
    codes_ds = pq_assign(embeddings_ds, n_sub=n_sub, k_codes=k_codes)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids, L = ray.get(ref)
        vids = df["vec_id"].to_numpy(np.int64)
        cm = np.stack([df[f"code{m}"].to_numpy(np.int64)
                       for m in range(n_sub)], axis=1)   # (b, n_sub)
        out = {"query_id": [], "vec_id": [], "adc6": []}
        for qi in range(len(ids)):
            adc = np.zeros(len(vids), dtype=np.float64)
            for m in range(n_sub):
                adc += L[qi, m, cm[:, m]]
            a6 = np.floor(adc * 1e6).astype(np.int64)
            order = np.lexsort((vids, a6))[:k]
            out["query_id"].extend([int(ids[qi])] * len(order))
            out["vec_id"].extend(vids[order].tolist())
            out["adc6"].extend(a6[order].tolist())
        return pd.DataFrame(out).astype("int64")

    parts = codes_ds.map_batches(partial, batch_format="pandas") \
        .to_pandas()
    outs = []
    for q in qids:
        sub = parts[parts["query_id"] == q] \
            .sort_values(["adc6", "vec_id"]).head(k)
        outs.append(pd.DataFrame({
            "query_id": np.full(len(sub), q, dtype=np.int64),
            "rnk": np.arange(len(sub), dtype=np.int64),
            "vec_id": sub["vec_id"].to_numpy(np.int64)}))
    return pd.concat(outs, ignore_index=True)

"""End-to-end LLM corpus-curation pipeline (VERDICT r03 item 9).

Composes the text + image curation stages into ONE checkpointed
pipeline with manifest lineage, the way ``pipelines/flagship.py``
composes the spectral chain:

  documents ──► C4 gates (pure per-row, no shuffle)
            ──► exact-dup drop set (md5 keep-first; one narrow
                (hash, doc_id) shuffle — text never enters it)
            ──► MinHash-LSH near-dup pairs over the survivors
                (stages/dedup.py:minhash_lsh_pairs, streamed)
            ──► keep-best-per-cluster drop set
                (stages/dedup.py:keep_best_per_cluster)
            ──► packed-chunk placement of the final kept docs
                (stages/text.py:pack_chunks)
            ──► checkpointed partitioned parquet + per-stage lineage
  images    ──► decode gates + phash exact dedup
                (stages/curate.py:imageprep_decisions)
            ──► checkpointed partitioned parquet

Scale shape: the corpus itself is never broadcast and never enters a
shuffle with its text column. The gates are pure per-row predicates,
so every later pass re-evaluates them inline instead of joining
against a (large) survivor list; the only driver-resident state is
the two DROP sets, each bounded by duplicate mass (the same bound
``keep_best_per_cluster`` already relies on), shipped once via
``ray.put``. The final placement table is written through the same
streaming checkpoint writer as the flagship (resume skips completed
partitions; ``compact_max_files`` bounds per-partition file counts).

Oracle story: every stage has an exact replay —
:func:`curation_kept_cte` builds the shared SQL CTE chain (gates from
``text.corpus_filter_sql`` semantics, components over the exact
all-pairs Jaccard sidecar, ANSI window keep-best), from which
:func:`curation_ledger_sql` and :func:`curation_placement_sql` derive
the two query oracles.
"""

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state import manifest as ckpt
from ..stages import dedup as dstage
from ..stages import text as tstage

GATE_KW = dict(min_stopwords=2, min_tokens=20,
               min_mtl_u6=4_000_000, max_mtl_u6=4_700_000)


def gated_documents(docs, **gate_kw):
    """Survivors of the C4 gates as a (doc_id, text, n_tokens)
    Dataset — one vectorized per-row pass, no shuffle."""
    kw = {**GATE_KW, **gate_kw}

    def gate(t: pa.Table) -> pa.Table:
        txt = pc.cast(t["text"], pa.string())
        keep, n_tokens, _ = tstage.gate_features(txt, **kw)
        idx = pa.array(np.flatnonzero(keep))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()).take(idx),
            "text": txt.take(idx),
            "n_tokens": pa.array(n_tokens[keep], pa.int64())})

    return docs.map_batches(gate, batch_format="pyarrow")


def exact_dup_drops(gated, as_dataset=False):
    """doc_ids dropped by md5 keep-first exact dedup. The shuffle itself
    carries 48-byte (hash, doc_id) rows, never text; the output is
    bounded by duplicate mass — only rows of multi-member hash groups
    beyond the min are emitted. With ``as_dataset=True`` the drop-id
    table streams out as a one-column Dataset (the shape the curation
    pipeline anti-joins against when duplicate mass is too large to
    broadcast); default returns driver pandas."""
    import hashlib

    def hash_stage(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(s.encode()).hexdigest()
             for s in t["text"].to_pylist()]
        return pa.table({"h": pa.array(h, pa.string()),
                         "doc_id": pc.cast(t["doc_id"], pa.int64())})

    def drops(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_id":
                                 pd.Series([], dtype="int64")})
        keep = g["doc_id"].min()
        return g.loc[g["doc_id"] != keep, ["doc_id"]].astype("int64")

    ds = gated.map_batches(hash_stage, batch_format="pyarrow") \
        .groupby("h").map_groups(drops, batch_format="pandas")
    if as_dataset:
        return ds
    out = ds.to_pandas()
    if "doc_id" not in out.columns:   # no dups anywhere -> no schema
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    return out


def _drop_filter(ds, drop_ref):
    """Filter a (doc_id, ...) Dataset against a broadcast drop-id set
    (``ray.put`` once, read per task — never re-shipped per batch)."""
    import ray

    def fn(t: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        if drop.size == 0:
            return t
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, drop)
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


#: Above this many drop ids, the curation pipeline stops broadcasting
#: drop sets (``ray.put`` + per-task ``np.isin``) and routes survivors
#: through the engine's tag-union ``anti_join`` instead — duplicate
#: mass at crawl scale is O(corpus), so the broadcast path is a driver
#: memory bomb beyond this bound. 2M int64 ids ≈ 16 MB probe array,
#: the largest broadcast worth shipping to every task.
DROP_BROADCAST_CAP = 2_000_000

#: run_curation parameters that change the OUTPUT (not just the
#: execution strategy) — fingerprinted into out_dir/params.json so a
#: resume with different semantics refuses instead of silently mixing
#: stale partitions with fresh drop sets.
_FINGERPRINTED = ("seq_len", "threshold", "num_perm", "bands",
                  "k_shingle", "n_write_parts", "gate_kw")


def _check_params(out_dir, params):
    import json
    path = os.path.join(out_dir, "params.json")
    blob = json.dumps(params, sort_keys=True)
    if os.path.exists(path):
        with open(path) as f:
            prev = f.read()
        if prev != blob:
            raise ValueError(
                "run_curation: %r holds a checkpoint produced with "
                "different parameters (%s) than this call (%s); "
                "resuming would skip completed partitions computed "
                "under the old semantics — use a fresh out_dir or "
                "delete the old one" % (out_dir, prev, blob))
    else:
        with open(path, "w") as f:
            f.write(blob)


def run_curation(docs, out_dir, seq_len=512, threshold=0.35,
                 num_perm=64, bands=16, k_shingle=8,
                 images=None, n_write_parts=16, compact_max_files=None,
                 gate_kw=None, drop_broadcast_cap=DROP_BROADCAST_CAP):
    """Run the full curation chain over a (doc_id, text) Dataset.

    Writes two checkpointed, manifest-tracked outputs under
    ``out_dir``: ``placement/`` (the packed-chunk placement of every
    kept doc, partitioned by ``doc_id % n_write_parts``) and
    ``ledger/`` (one verdict row per input doc:
    gate | exact_dup | near_dup | kept). With ``images`` (a raw images
    Dataset) also writes ``image_verdicts/``. Returns a dict of
    handles: drop sets, per-stage timings, lineage, dirs.

    Drop-set application is threshold-gated per drop set: with at most
    ``drop_broadcast_cap`` ids the set broadcasts once via ``ray.put``
    and filters with a vectorized ``np.isin`` probe (zero extra
    shuffles — the fast path for typical dup mass); beyond the cap the
    set STAYS a Dataset and survivors route through the tag-union
    ``anti_join`` (stages/relational.py), so driver memory and
    per-task probe size never scale with duplicate mass. In anti-join
    mode the verdict ledger is likewise a narrow tag-code
    ``groupby(doc_id).aggregate(Max)`` union instead of broadcast
    ``np.isin`` probes; only bounded scalars (drop counts) ever reach
    the driver, and ``exact_drops``/``near_drops`` in the result are
    ``None`` (use the ``*_ds`` Dataset handles).

    A parameter fingerprint (``params.json``) guards resume: re-running
    into an existing ``out_dir`` with different output-changing
    parameters raises instead of silently mixing stale partitions with
    fresh drop sets.
    """
    import ray
    import ray.data

    from ..stages import relational as rel

    gate_kw = {**GATE_KW, **(gate_kw or {})}
    os.makedirs(out_dir, exist_ok=True)
    _check_params(out_dir, {
        "seq_len": int(seq_len), "threshold": float(threshold),
        "num_perm": int(num_perm), "bands": int(bands),
        "k_shingle": int(k_shingle), "n_write_parts": int(n_write_parts),
        "gate_kw": {k: int(v) for k, v in sorted(gate_kw.items())}})
    cap = int(drop_broadcast_cap)
    timings = {}
    t0 = time.monotonic()

    gated = gated_documents(docs, **gate_kw)
    ex_ds = exact_dup_drops(gated, as_dataset=True).materialize()
    n_ex = ex_ds.count()
    bcast_ex = n_ex <= cap
    if bcast_ex:
        ex_pd = ex_ds.to_pandas()
        ex_arr = (np.sort(ex_pd["doc_id"].to_numpy(np.int64))
                  if "doc_id" in ex_pd.columns and len(ex_pd)
                  else np.array([], dtype=np.int64))
        ex_ref = ray.put(ex_arr)
        survivors = _drop_filter(gated, ex_ref)
    else:
        # duplicate mass beyond the broadcast cap: one corpus shuffle
        # keyed by doc_id (the only full-width exchange in the
        # pipeline), materialized because four downstream passes
        # consume the survivor set
        survivors = rel.anti_join(gated, ex_ds, "doc_id").materialize()
    timings["exact_dedup"] = time.monotonic() - t0

    t1 = time.monotonic()
    pairs = dstage.minhash_lsh_pairs(
        survivors, num_perm=num_perm, bands=bands, k=k_shingle,
        threshold=threshold, as_dataset=True).materialize()
    cl_ds = dstage.resolve_duplicate_clusters(
        pairs, as_dataset=True).materialize()
    n_clustered = cl_ds.count()
    bcast_nd = n_clustered <= cap
    nd_ds = None
    if bcast_nd:
        kb = dstage.keep_best_per_cluster(survivors, pairs,
                                          clusters=cl_ds)
        nd_ids = set(int(i) for i in kb.loc[kb["kept"] == 0, "doc_id"])
        n_nd = len(nd_ids)
    else:
        kb = dstage.keep_best_per_cluster(
            survivors, pairs, as_dataset=True, clusters=cl_ds) \
            .materialize()
        nd_ds = kb.map_batches(
            lambda t: t.filter(pc.equal(t["kept"], 0))
                       .select(["doc_id"]),
            batch_format="pyarrow").materialize()
        n_nd = nd_ds.count()
    timings["near_dedup"] = time.monotonic() - t1

    t2 = time.monotonic()
    if bcast_nd:
        nd_ref = ray.put(np.array(sorted(nd_ids), dtype=np.int64))
        final = _drop_filter(survivors, nd_ref)
    else:
        final = rel.anti_join(survivors, nd_ds, "doc_id")
    placement = tstage.pack_chunks(final, seq_len=seq_len)

    P = int(n_write_parts)

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(t["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False) % P
        return t.append_column("part",
                               pa.array(part.astype(np.uint64)))

    pl_dir = os.path.join(out_dir, "placement")
    pl_parted, _skip = ckpt.resume_filter(
        placement.map_batches(add_part, batch_format="pyarrow"),
        pl_dir, "part")
    pl_metrics, _ = ckpt.checkpointed_write_streaming(
        pl_parted, pl_dir, "part", stage="placement")
    timings["placement"] = time.monotonic() - t2

    # verdict ledger. Both drop sets broadcast (the typical case):
    # gates re-evaluated inline (pure per-row) + np.isin probes — one
    # pass over the raw corpus, no joins. Any drop set distributed:
    # narrow tag-code rows (doc_id, code) from the corpus pass union
    # the drop-id Datasets and ONE groupby(doc_id) Max aggregate
    # resolves precedence (codes: 3=gate, 2=exact_dup, 1=near_dup,
    # 0=kept; the three sources are disjoint by construction — drops
    # are computed over gate survivors and exact drops are removed
    # before near-dup runs — so Max is exact, not a tiebreak).
    t3 = time.monotonic()

    if bcast_ex and bcast_nd:
        def verdicts(t: pa.Table) -> pa.Table:
            txt = pc.cast(t["text"], pa.string())
            keep, _, _ = tstage.gate_features(txt, **gate_kw)
            ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(
                zero_copy_only=False)
            ex = np.isin(ids, ray.get(ex_ref))
            nd = np.isin(ids, ray.get(nd_ref))
            v = np.where(~keep, "gate",
                         np.where(ex, "exact_dup",
                                  np.where(nd, "near_dup", "kept")))
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "verdict": pa.array(v.tolist(), pa.string()),
                "part": pa.array((ids % P).astype(np.uint64))})

        led_rows = docs.map_batches(verdicts, batch_format="pyarrow")
    else:
        from ray.data.aggregate import Max

        def code_rows(t: pa.Table) -> pa.Table:
            txt = pc.cast(t["text"], pa.string())
            keep, _, _ = tstage.gate_features(txt, **gate_kw)
            return pa.table({
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "code": pa.array(np.where(keep, 0, 3)
                                 .astype(np.int64))})

        def _code_ds(ds, arr, code):
            if ds is None:
                ds = ray.data.from_arrow(pa.table(
                    {"doc_id": pa.array(np.sort(arr), pa.int64())}))
            return ds.map_batches(
                lambda t: pa.table({
                    "doc_id": pc.cast(t["doc_id"], pa.int64()),
                    "code": pa.array(
                        np.full(t.num_rows, code, np.int64))}),
                batch_format="pyarrow")

        tagged = docs.map_batches(
            code_rows, batch_format="pyarrow").union(
            _code_ds(None if bcast_ex else ex_ds,
                     ex_arr if bcast_ex else None, 2),
            _code_ds(None if bcast_nd else nd_ds,
                     np.array(sorted(nd_ids), dtype=np.int64)
                     if bcast_nd else None, 1))
        coded = tagged.groupby("doc_id").aggregate(
            Max("code", alias_name="code"))

        _VERD = np.array(["kept", "near_dup", "exact_dup", "gate"])

        def to_verdict(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(
                zero_copy_only=False)
            code = pc.cast(t["code"], pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "verdict": pa.array(_VERD[code].tolist(), pa.string()),
                "part": pa.array((ids % P).astype(np.uint64))})

        led_rows = coded.map_batches(to_verdict, batch_format="pyarrow")

    led_dir = os.path.join(out_dir, "ledger")
    led_parted, _skip = ckpt.resume_filter(led_rows, led_dir, "part")
    led_metrics, _ = ckpt.checkpointed_write_streaming(
        led_parted, led_dir, "part", stage="ledger")
    timings["ledger"] = time.monotonic() - t3

    img_dir = None
    img_metrics = None
    if images is not None:
        t4 = time.monotonic()
        from ..stages import curate as cstage
        iv = cstage.imageprep_decisions(images)

        def img_part(df: pd.DataFrame) -> pd.DataFrame:
            import hashlib
            df = df.copy()
            # stable (NOT Python hash(), which is per-process salted —
            # partitions must be deterministic for resume)
            df["part"] = np.array(
                [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % P
                 for s in df["image_id"]], dtype=np.uint64)
            return df

        img_dir = os.path.join(out_dir, "image_verdicts")
        iv_parted, _skip = ckpt.resume_filter(
            iv.map_batches(img_part, batch_format="pandas"),
            img_dir, "part")
        img_metrics, _ = ckpt.checkpointed_write_streaming(
            iv_parted, img_dir, "part", stage="image_verdicts")
        timings["image_verdicts"] = time.monotonic() - t4

    if compact_max_files:
        for d in (pl_dir, led_dir) + ((img_dir,) if img_dir else ()):
            ckpt.compact_partitions(d, max_files=compact_max_files)

    timings["total"] = time.monotonic() - t0
    return {
        "placement_dir": pl_dir,
        "ledger_dir": led_dir,
        "image_verdicts_dir": img_dir,
        # id LISTS only in broadcast mode — in anti-join mode the sets
        # never land on the driver; consume the *_ds handles instead
        "exact_drops": sorted(int(i) for i in ex_arr) if bcast_ex
        else None,
        "near_drops": sorted(nd_ids) if bcast_nd else None,
        "exact_drop_count": int(n_ex),
        "near_drop_count": int(n_nd),
        "exact_drops_ds": ex_ds,
        "near_drops_ds": nd_ds,
        "drop_mode": {"exact": "broadcast" if bcast_ex else "anti_join",
                      "near": "broadcast" if bcast_nd else "anti_join"},
        "keep_best": kb,
        "lineage": {"placement": pl_metrics, "ledger": led_metrics,
                    "image_verdicts": img_metrics},
        "timings": timings,
    }


# ---------------------------------------------------------------------------
# oracles

def curation_kept_cte(corpus_dir, threshold_u6=350_000,
                      min_stopwords=2, min_tokens=20,
                      min_mtl_u6=4_000_000, max_mtl_u6=4_700_000):
    """The shared SQL CTE chain replaying the whole curation decision:
    gates → exact keep-first → components over the exact all-pairs
    Jaccard sidecar (restricted to survivors) → keep-best window.
    Exposes CTEs ``feat`` (all docs + gate verdict ingredients),
    ``s`` (exact-dedup survivors), ``ex_drop``, ``nd_drop``, and
    ``kept`` (final doc_id set)."""
    stop = ", ".join("'%s'" % s for s in tstage.EN_STOPWORDS)
    return f"""
        feat AS (
          SELECT doc_id, text, md5(text) AS h,
                 CAST(len(list_filter(string_split(text, ' '),
                      x -> x <> '')) AS BIGINT) AS n_tokens,
                 len(list_filter(string_split(lower(text), ' '),
                     x -> x IN ({stop}))) AS n_stop,
                 CAST(CASE WHEN len(list_filter(string_split(text, ' '),
                      x -> x <> '')) > 0 THEN floor(
                      list_sum(list_transform(
                          list_filter(string_split(text, ' '),
                                      x -> x <> ''),
                          x -> length(x)))
                      * 1000000.0 /
                      len(list_filter(string_split(text, ' '),
                          x -> x <> ''))) ELSE 0 END AS BIGINT)
                   AS mean_tok_len_u6
          FROM documents),
        g AS (
          SELECT * FROM feat
          WHERE n_stop >= {min_stopwords}
            AND n_tokens >= {min_tokens}
            AND mean_tok_len_u6 BETWEEN {min_mtl_u6}
                AND {max_mtl_u6}),
        gk AS (
          SELECT *, row_number() OVER (PARTITION BY h
                   ORDER BY doc_id) AS rn
          FROM g),
        ex_drop AS (SELECT doc_id FROM gk WHERE rn > 1),
        s AS (SELECT doc_id, text, n_tokens FROM gk WHERE rn = 1),
        p AS (SELECT doc_a, doc_b
              FROM read_parquet(
                  '{corpus_dir}/minhash_expected.parquet')
              WHERE NOT planted AND jaccard_u6 >= {threshold_u6}
                AND doc_a IN (SELECT doc_id FROM s)
                AND doc_b IN (SELECT doc_id FROM s)),
        e AS (SELECT doc_a AS u, doc_b AS v FROM p
              UNION SELECT doc_b, doc_a FROM p),
        nn AS (SELECT DISTINCT u AS id FROM e),
        r(id, lab) AS (
            SELECT id, id FROM nn
            UNION
            SELECT e.u, r.lab FROM e JOIN r ON r.id = e.v),
        cl AS (SELECT id AS doc_id, min(lab) AS canon_id
               FROM r GROUP BY id),
        kbw AS (SELECT cl.doc_id,
                       row_number() OVER (PARTITION BY cl.canon_id
                           ORDER BY s.n_tokens DESC, cl.doc_id ASC)
                         AS krn
                FROM cl JOIN s ON s.doc_id = cl.doc_id),
        nd_drop AS (SELECT doc_id FROM kbw WHERE krn > 1),
        kept AS (SELECT doc_id FROM s
                 WHERE doc_id NOT IN (SELECT doc_id FROM nd_drop))"""


def curation_ledger_sql(corpus_dir, **kw):
    """Oracle for the per-doc verdict ledger."""
    return f"""
        WITH RECURSIVE {curation_kept_cte(corpus_dir, **kw)}
        SELECT d.doc_id,
               CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM g)
                      THEN 'gate'
                    WHEN d.doc_id IN (SELECT doc_id FROM ex_drop)
                      THEN 'exact_dup'
                    WHEN d.doc_id IN (SELECT doc_id FROM nd_drop)
                      THEN 'near_dup'
                    ELSE 'kept' END AS verdict
        FROM documents d"""


def curation_placement_sql(corpus_dir, seq_len=512, **kw):
    """Oracle for the packed-chunk placement of the kept docs —
    ``pack_chunks_sql`` over the kept set from the shared CTE chain."""
    L = int(seq_len)
    return f"""
        WITH RECURSIVE {curation_kept_cte(corpus_dir, **kw)},
        t AS (
          SELECT s.doc_id, s.n_tokens FROM s
          WHERE s.doc_id IN (SELECT doc_id FROM kept)),
        ss AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                     ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
          FROM t)
        SELECT doc_id, n_tokens, tok_start,
               CAST(CASE WHEN n_tokens > 0
                    THEN tok_start // {L} ELSE -1 END AS BIGINT)
                 AS chunk_first,
               CAST(CASE WHEN n_tokens > 0
                    THEN (tok_start + n_tokens - 1) // {L} ELSE -1 END
                 AS BIGINT) AS chunk_last,
               CAST(CASE WHEN n_tokens > 0
                    THEN (tok_start + n_tokens - 1) // {L}
                         - tok_start // {L} + 1
                    ELSE 0 END AS BIGINT) AS n_chunks
        FROM ss"""

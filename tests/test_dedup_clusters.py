"""Connected-components duplicate-cluster resolution + corpus filter."""

import numpy as np
import pandas as pd
import pytest

from unmixing_ray.stages.dedup import resolve_duplicate_clusters


def _cc_reference(pairs):
    """Driver-side union-find ground truth."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_chain_and_islands(ray_session):
    # one long chain (exercises pointer jumping), one triangle, one pair
    pairs = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
             (30, 31), (31, 32), (30, 32),
             (50, 51)]
    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    got = resolve_duplicate_clusters(df)
    want = _cc_reference(pairs)
    assert dict(zip(got["doc_id"], got["canon_id"])) == want
    assert got["doc_id"].is_monotonic_increasing
    assert got.dtypes["canon_id"] == np.int64


def test_long_chain_needs_jumping(ray_session):
    # diameter 63: min-label propagation alone needs 63 rounds; with
    # pointer jumping the default max_rounds=16 must suffice
    pairs = [(i, i + 1) for i in range(100, 163)]
    got = resolve_duplicate_clusters(pd.DataFrame(
        pairs, columns=["doc_a", "doc_b"]))
    assert (got["canon_id"] == 100).all()
    assert len(got) == 64


def test_random_graph_vs_union_find(ray_session):
    rng = np.random.default_rng(7)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 60, (80, 2))
             if a != b]
    got = resolve_duplicate_clusters(pd.DataFrame(
        pairs, columns=["doc_a", "doc_b"]))
    want = _cc_reference(pairs)
    assert dict(zip(got["doc_id"], got["canon_id"])) == want


def test_empty_pairs(ray_session):
    got = resolve_duplicate_clusters(pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64")}))
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "canon_id"]


def test_corpus_filter_gates(ray_session):
    import ray.data
    from unmixing_ray.stages.text import corpus_filter
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "the cat and the dog sat in a big sunny garden today "
            "watching birds fly over the old wooden fence",   # keeps
            "short the and of",                                # too short
            "x " * 40,                                         # mtl too low
            "the cat and the dog sat in a big sunny garden today "
            "watching birds fly over the old wooden fence",   # exact dup of 1
            "verylongtokenwithoutspaces " * 25,                # mtl too high
        ]})
    out = corpus_filter(ray.data.from_pandas(docs), min_tokens=10,
                        min_mtl_u6=3_000_000, max_mtl_u6=9_000_000)
    out = out.to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1]   # dup keeps min doc_id


def test_keep_best_per_cluster(ray_session):
    import ray.data
    from unmixing_ray.stages.dedup import keep_best_per_cluster
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "a b c",                 # cluster {1,2,3}: 3 tokens
            "a b c d e f g",         # 7 tokens -> kept
            "a b c d",               # 4 tokens
            "x y",                   # cluster {4,5}: tie on 2 tokens
            "p q",                   # tie -> min doc_id (4) kept
            "unclustered text",      # no pair: not emitted
        ]})
    pairs = pd.DataFrame({"doc_a": [1, 2, 4], "doc_b": [2, 3, 5]})
    out = keep_best_per_cluster(ray.data.from_pandas(docs), pairs)
    assert out["doc_id"].tolist() == [1, 2, 3, 4, 5]
    assert out["canon_id"].tolist() == [1, 1, 1, 4, 4]
    assert dict(zip(out["doc_id"], out["kept"])) == {
        1: 0, 2: 1, 3: 0, 4: 1, 5: 0}


def test_cross_corpus_join_ids_may_collide(ray_session):
    """The rendezvous key is (id, side): identical ids on both sides must
    not cross-contaminate, and only CROSS pairs are emitted even when a
    side has internal duplicates."""
    import ray.data
    from unmixing_ray.stages.dedup import cross_corpus_minhash_join
    t = ("the quick brown fox jumps over the lazy dog again and again "
         "until the evening falls quietly over the hills")
    corpus = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [t, t, "completely different content about shipping "
                       "manifests and harbor cranes at midnight"]}))
    bench = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 9],
        "text": [t + " extra", "unrelated benchmark prose about violins "
                               "and sheet music in the attic"]}))
    out = cross_corpus_minhash_join(corpus, bench, threshold=0.5)
    # corpus 1 and 2 (internal dups) each pair with bench 1; never with
    # each other, never with bench 9
    assert set(zip(out["doc_id"], out["bench_id"])) == {(1, 1), (2, 1)}
    assert (out["jaccard_u6"] >= 500000).all()


def test_pair_tables_stream_as_datasets(ray_session):
    """VERDICT r03 item 5: the near-dup pair table and the cluster map
    must be obtainable as Datasets (no driver pandas hop inside the
    stages), and the Dataset path must equal the pandas convenience
    path row-for-row, in both text-gather modes."""
    import ray.data
    from unmixing_ray.stages.dedup import (minhash_lsh_pairs,
                                           resolve_duplicate_clusters)
    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank every single morning before sunrise %d")
    rows = {"doc_id": [], "text": []}
    for i in range(12):
        rows["doc_id"].append(i)
        rows["text"].append(base % (i // 4))   # 3 groups of 4 near-dups
    docs = ray.data.from_pandas(pd.DataFrame(rows)).repartition(5)

    as_pd = minhash_lsh_pairs(docs, threshold=0.5)
    as_ds = minhash_lsh_pairs(docs, threshold=0.5, as_dataset=True)
    assert not isinstance(as_ds, pd.DataFrame)
    got = as_ds.to_pandas().sort_values(["doc_a", "doc_b"])\
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, as_pd)

    from unmixing_ray.stages.dedup import verify_jaccard_pairs
    cand = ray.data.from_pandas(
        as_pd[["doc_a", "doc_b"]].astype("int64"))
    via_rdv = verify_jaccard_pairs(docs, cand, k=8, threshold=0.5,
                                   gather="rendezvous")
    pd.testing.assert_frame_equal(via_rdv, as_pd)

    cl_pd = resolve_duplicate_clusters(as_pd)
    cl_ds = resolve_duplicate_clusters(as_ds, as_dataset=True)
    assert not isinstance(cl_ds, pd.DataFrame)
    got_cl = cl_ds.to_pandas().sort_values("doc_id")\
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got_cl, cl_pd)

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

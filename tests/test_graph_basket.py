"""Triangle counting and basket pair mining pinned against brute-force
references on random inputs, at several parallelism-irrelevant batch
layouts (the operators must be partitioning-invariant by construction)."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages.relational import basket_pairs, triangle_count


def _random_graph(rng, n_nodes, n_edges):
    seen = set()
    while len(seen) < n_edges:
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            seen.add((min(int(a), int(b)), max(int(a), int(b))))
    return sorted(seen)


def _brute_triangles(edges):
    es = set(edges)
    nodes = sorted({v for e in edges for v in e})
    return sum(1 for a, b, c in itertools.combinations(nodes, 3)
               if (a, b) in es and (a, c) in es and (b, c) in es)


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (1, 12, 30), (2, 30, 100), (3, 8, 28)])   # last one: complete-ish
def test_triangle_count_matches_brute_force(ray_session, seed,
                                            n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    edges = _random_graph(rng, n_nodes, n_edges)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"a": [e[0] for e in edges], "b": [e[1] for e in edges]}
    ).astype("int64")).repartition(5)
    got = triangle_count(ds)
    assert int(got["n_edges"].iloc[0]) == len(edges)
    assert int(got["n_nodes"].iloc[0]) == \
        len({v for e in edges for v in e})
    assert int(got["n_triangles"].iloc[0]) == _brute_triangles(edges)


def test_basket_pairs_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    rows = []
    for basket in range(40):
        items = rng.choice(12, size=rng.integers(1, 6), replace=True)
        rows += [{"basket": basket, "item": int(i)} for i in items]
    ds = ray.data.from_items(rows).repartition(7)
    got = basket_pairs(ds, "basket", "item", min_support=2).to_pandas()
    # brute force
    baskets = {}
    for r in rows:
        baskets.setdefault(r["basket"], set()).add(r["item"])
    from collections import Counter
    pair_n = Counter()
    item_n = Counter()
    for items in baskets.values():
        for i in items:
            item_n[i] += 1
        for x, y in itertools.combinations(sorted(items), 2):
            pair_n[(x, y)] += 1
    want = {(x, y): n for (x, y), n in pair_n.items() if n >= 2}
    got_pairs = {(int(r["a"]), int(r["b"])): int(r["n_ab"])
                 for _, r in got.iterrows()}
    assert got_pairs == want
    for _, r in got.iterrows():
        assert int(r["n_a"]) == item_n[int(r["a"])]
        assert int(r["n_b"]) == item_n[int(r["b"])]

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


def _brute_components(edges, nodes, rounds):
    lab = {v: v for v in nodes}
    adj = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for _ in range(rounds):
        lab = {v: min([lab[v]] + [lab[u] for u in adj[v]])
               for v in nodes}
    return lab


@pytest.mark.parametrize("seed,n_nodes,n_edges,rounds",
                         [(3, 30, 25, 4), (11, 60, 45, 3),
                          (23, 40, 80, 5)])
def test_graph_components_matches_brute_force(ray_session, seed,
                                              n_nodes, n_edges, rounds):
    from unmixing_ray.stages.relational import graph_components
    rng = np.random.default_rng(seed)
    edges = _random_graph(rng, n_nodes, n_edges)
    nodes = sorted({v for e in edges for v in e})
    ds = ray.data.from_pandas(pd.DataFrame(
        {"a": [e[0] for e in edges], "b": [e[1] for e in edges]}
    ).astype("int64")).repartition(5)
    got = graph_components(ds, rounds=rounds).to_pandas()
    want = _brute_components(edges, nodes, rounds)
    assert {int(r["v"]): int(r["comp"])
            for _, r in got.iterrows()} == want


def test_clustering_coeff_matches_brute_force(ray_session):
    from unmixing_ray.stages.relational import clustering_coeff
    rng = np.random.default_rng(17)
    edges = _random_graph(rng, 25, 60)
    es = set(edges)
    nodes = sorted({v for e in edges for v in e})
    deg = {v: 0 for v in nodes}
    tri = {v: 0 for v in nodes}
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    ds = ray.data.from_pandas(pd.DataFrame(
        {"a": [e[0] for e in edges], "b": [e[1] for e in edges]}
    ).astype("int64")).repartition(6)
    got = clustering_coeff(ds).to_pandas()
    assert len(got) == len(nodes)
    for _, r in got.iterrows():
        v = int(r["v"])
        assert int(r["deg"]) == deg[v]
        assert int(r["n_tri"]) == tri[v]
        assert int(r["n_wedge"]) == deg[v] * (deg[v] - 1) // 2

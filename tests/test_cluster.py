"""Distributed k-means (stages/cluster.py): Lloyd training must recover
planted blob structure, decrease inertia monotonically, and be
batching-invariant up to float-merge order; assignment must equal the
single-machine argmin reference."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages import cluster


def _blobs(n_per=100, k=4, d=16, seed=5, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 3.0
    rows = []
    for c in range(k):
        pts = centers[c] + rng.normal(size=(n_per, d)) * spread
        rows.append(pd.DataFrame({
            "vec_id": np.arange(c * n_per, (c + 1) * n_per,
                                dtype=np.int64),
            "embedding": [p.tolist() for p in pts],
            "label": np.full(n_per, c, dtype=np.int64)}))
    return pd.concat(rows, ignore_index=True), centers


def test_kmeans_recovers_blobs(ray_session):
    df, _ = _blobs()
    ds = ray.data.from_pandas(df).repartition(5)
    C, hist = cluster.kmeans_fit(ds, k=4, iters=8)
    # inertia never increases across Lloyd iterations
    assert all(hist[i + 1] <= hist[i] + 1e-9
               for i in range(len(hist) - 1)), hist
    # purity: every planted blob maps to one dominant cluster
    a = cluster.assign(ds, C).to_pandas().sort_values("vec_id")
    lab = df.sort_values("vec_id")["label"].to_numpy()
    purity = 0
    for c in np.unique(a["cluster_id"]):
        sel = a["cluster_id"].to_numpy() == c
        if sel.any():
            purity += np.bincount(lab[sel]).max()
    assert purity / len(df) >= 0.95


def test_kmeans_batching_invariant(ray_session):
    df, _ = _blobs(n_per=60, k=3)
    c1, h1 = cluster.kmeans_fit(
        ray.data.from_pandas(df).repartition(1), k=3, iters=5)
    c7, h7 = cluster.kmeans_fit(
        ray.data.from_pandas(df).repartition(7), k=3, iters=5)
    assert np.allclose(c1, c7, atol=1e-8)
    assert np.allclose(h1, h7, rtol=1e-10)


def test_assign_matches_numpy_reference(ray_session):
    df, _ = _blobs(n_per=40, k=3, d=8)
    rng = np.random.default_rng(0)
    C = rng.normal(size=(5, 8))
    got = cluster.assign(ray.data.from_pandas(df).repartition(4), C)\
        .to_pandas().sort_values("vec_id")["cluster_id"].to_numpy()
    X = np.array([np.asarray(v) for v in
                  df.sort_values("vec_id")["embedding"]])
    want = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)\
        .argmin(axis=1)
    assert (got == want).all()


def test_seeded_init_batching_invariant(ray_session):
    df, _ = _blobs(n_per=50, k=2)
    i1 = cluster.seeded_init(ray.data.from_pandas(df).repartition(1),
                             k=4)
    i9 = cluster.seeded_init(ray.data.from_pandas(df).repartition(9),
                             k=4)
    assert np.array_equal(i1, i9)

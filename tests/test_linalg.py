"""Distributed Gram / PCA over an embedding column: integer-exact
partials (batching-invariant), driver eigh invariants."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages.linalg import (
    FIXED_POINT_SCALE, embedding_gram, gram_to_arrays, pca_fit,
    pca_project)


def _ds(X, repartition=3):
    df = pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": [row.astype(np.float32).tolist() for row in X]})
    return ray.data.from_pandas(df).repartition(repartition)


def _rand(n=200, d=16, seed=7):
    rng = np.random.default_rng(seed)
    # low-rank + noise so the spectrum is interesting
    B = rng.normal(size=(n, 3)) @ rng.normal(size=(3, d))
    return (B + 0.05 * rng.normal(size=(n, d))).astype(np.float32)


@pytest.mark.parametrize("parts", [1, 3, 11])
def test_gram_exact_and_batching_invariant(ray_session, parts):
    X = _rand()
    got = embedding_gram(_ds(X, parts)).to_pandas()
    G, s, n = gram_to_arrays(got)
    q = np.floor(X.astype(np.float64) * FIXED_POINT_SCALE).astype(
        np.int64)
    np.testing.assert_array_equal(G, q.T @ q)
    np.testing.assert_array_equal(s, q.sum(axis=0))
    assert n == len(X)


def test_pca_invariants(ray_session):
    X = _rand()
    comps, w, mean = pca_fit(_ds(X), k=5)
    # descending spectrum, orthonormal axes
    assert (np.diff(w) <= 1e-12).all()
    np.testing.assert_allclose(comps @ comps.T, np.eye(5), atol=1e-10)
    # eigenvalues match the numpy covariance spectrum of the quantized
    # data (the contract: exact Gram, not exact float covariance)
    q = np.floor(X.astype(np.float64) * FIXED_POINT_SCALE) \
        / FIXED_POINT_SCALE
    ref = np.linalg.eigvalsh(np.cov(q.T, bias=True))[::-1][:5]
    np.testing.assert_allclose(w, ref, rtol=1e-9, atol=1e-12)
    # sign convention: largest-|coeff| entry positive
    assert (comps[np.arange(5), np.abs(comps).argmax(axis=1)] > 0).all()


def test_pca_project_variance_matches_eigvals(ray_session):
    X = _rand(n=300)
    comps, w, mean = pca_fit(_ds(X), k=4)
    Y = pca_project(_ds(X), comps, mean).to_pandas() \
        .sort_values("vec_id")
    P = Y[["pc%d" % i for i in range(4)]].to_numpy()
    # the projection of the float32 data differs from the quantized-data
    # eigenbasis only by the 2^-16 quantization — variances agree to ~1e-4
    np.testing.assert_allclose(P.var(axis=0, ddof=0), w, rtol=1e-3)
    # components decorrelate the data
    C = np.cov(P.T, bias=True)
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 1e-3 * w[0]


def test_pca_project_exact_partitioning_invariant(ray_session):
    from unmixing_ray.stages.linalg import pca_project_exact
    rng = np.random.default_rng(31)
    X = rng.normal(scale=0.3, size=(120, 8)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": X[i].tolist()}
            for i in range(len(X))]
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_items(rows).repartition(parts)
        got = pca_project_exact(ds, k=3).to_pandas()\
            .sort_values("vec_id").reset_index(drop=True)
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # exactness vs a direct single-machine replay of the spec
    q = np.floor(X.astype(np.float64) * (1 << 16)).astype(np.int64)
    n, d = q.shape
    G, s = q.T @ q, q.sum(axis=0)
    cov = (G / n - np.outer(s / n, s / n)) / float((1 << 16) ** 2)
    w, V = np.linalg.eigh(cov)
    comps = V[:, np.argsort(w)[::-1]].T
    flip = comps[np.arange(len(comps)),
                 np.abs(comps).argmax(axis=1)] < 0
    comps[flip] *= -1.0
    Cq = np.floor(comps[:3] * (1 << 20)).astype(np.int64)
    Y = (n * q - s[None, :]) @ Cq.T
    got = outs[0]
    assert (got[["pj0", "pj1", "pj2"]].to_numpy() == Y).all()

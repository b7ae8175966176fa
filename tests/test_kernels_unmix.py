"""FCLS/NNLS, MNF, endmember induction kernels: golden + property tests.

The reference pins FCLS output by SHA-256 and 1-proc==2-proc equality
(test/tests.py:43-82); our analogues: exact recovery on noiseless
mixtures, sum-to-one + non-negativity invariants, block-split equality,
and a pinned golden hash on a deterministic synthetic input.
"""

import hashlib

import numpy as np
import pytest

from unmixing_ray.kernels import endmembers as E
from unmixing_ray.kernels import mnf as M
from unmixing_ray.kernels import nnls as N

RNG = np.random.default_rng(77)
U3 = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])  # q=3, k=2


def test_fcls_exact_recovery():
    A = RNG.dirichlet([1, 1, 1], size=200)          # (c, 3) true abundances
    X = A @ U3                                       # noiseless mixtures
    out = N.fcls_pixels(X, U3)
    assert np.allclose(out, A, atol=1e-8)


def test_fcls_constraints_under_noise():
    A = RNG.dirichlet([0.6, 1.0, 2.0], size=500)
    X = A @ U3 + RNG.normal(0, 0.5, size=(500, 2))
    out = N.fcls_pixels(X, U3)
    assert (out >= -1e-12).all()
    assert np.allclose(out.sum(axis=1), 1.0, atol=1e-8)


def test_fcls_batching_invariance():
    """Engine analogue of the reference's 1-proc == 2-proc bit-for-bit pin."""
    A = RNG.dirichlet([1, 1, 1], size=301)
    X = A @ U3 + RNG.normal(0, 1.0, size=(301, 2))
    whole = N.fcls_pixels(X, U3)
    parts = np.vstack([N.fcls_pixels(X[:150], U3),
                       N.fcls_pixels(X[150:], U3)])
    assert np.array_equal(whole, parts)


def test_fcls_golden_hash():
    """Pinned at first green run; must never drift."""
    rng = np.random.default_rng(1234)
    A = rng.dirichlet([1, 1, 1], size=100)
    X = A @ U3 + rng.normal(0, 0.3, size=(100, 2))
    out = N.fcls_pixels(X, U3)
    digest = hashlib.sha256(np.round(out, 10).tobytes()).hexdigest()
    assert digest == GOLDEN_FCLS_SHA256, digest


GOLDEN_FCLS_SHA256 = (
    "2cc6151d5a36683e57cca8571d76473ace6444494a9d97dbecf40ace170ede50")


def test_nnls_matches_exact_on_fcls_system():
    A = RNG.dirichlet([1, 1, 1], size=50)
    X = A @ U3 + RNG.normal(0, 0.2, size=(50, 2))
    exact = N.fcls_pixels(X, U3, exact_max_q=8)
    delta = 1.0 / (10.0 * abs(U3).max())
    Aug = np.vstack([delta * U3.T, np.ones((1, 3))])
    for i in range(50):
        b = np.concatenate([delta * X[i], [1.0]])
        lh = N.nnls_lh(Aug, b)
        assert np.allclose(lh / max(1e-12, lh.sum()), exact[i], atol=1e-4)


def test_mesma_pixelwise():
    Us = np.stack([U3 + RNG.normal(0, 0.01, U3.shape) for _ in range(40)])
    A = RNG.dirichlet([1, 1, 1], size=40)
    X = np.einsum("cq,cqk->ck", A, Us)
    out = N.fcls_pixelwise_endmembers(X, Us)
    assert np.allclose(out, A, atol=1e-6)


def test_mnf_distributed_equals_single():
    rng = np.random.default_rng(8)
    arr = rng.normal(1000, 200, size=(6, 16, 16))
    arr[:, 0, 0] = -9999
    # single-pass
    stats = M.partial_stats(arr)
    W, snr = M.rotation_from_stats(stats)
    # tile split along rows: partials must merge to identical stats
    parts = [M.partial_stats(arr[:, :8, :]), M.partial_stats(arr[:, 8:, :])]
    merged = M.merge_stats(parts)
    # row-split keeps horizontal diffs identical
    W2, snr2 = M.rotation_from_stats(merged)
    assert np.allclose(W, W2)
    assert np.allclose(snr, snr2)
    # projection shape and HSI convenience form
    hsi = M.mnf_rotation(arr)
    assert hsi.shape == (16, 16, 6)


def test_mnf_orders_by_snr():
    rng = np.random.default_rng(9)
    n = 64
    base = rng.normal(0, 1, size=(1, n, n))
    smooth = np.cumsum(base, axis=2)  # spatially correlated = high SNR
    noise = rng.normal(0, 1, size=(2, n, n))
    arr = np.concatenate([smooth, noise], axis=0)
    stats = M.partial_stats(arr)
    W, snr = M.rotation_from_stats(stats)
    assert snr[0] >= snr[1] >= snr[2]
    # first component should be dominated by the smooth band
    assert abs(W[0, 0]) > abs(W[1, 0]) and abs(W[0, 0]) > abs(W[2, 0])


def test_convex_hull_graham():
    pts = [(0, 0), (2, 0), (2, 2), (0, 2), (1, 1), (0, 1)]
    hull = E.convex_hull_graham(pts)
    assert hull == [(0, 0), (2, 0), (2, 2), (0, 2)]
    idx, hull2 = E.convex_hull_graham(pts, indices=True)
    assert [pts[i] for i in idx] == hull2 == hull


def test_endmember_searches():
    gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
    # feature raster: 3 bands, 10x10; plant distinctive spectra
    arr = np.zeros((3, 10, 10))
    arr[:, 0, 0] = (10, 0, 0)
    arr[:, 0, 9] = (0, 10, 0)
    arr[:, 9, 0] = (0, 0, 10)
    arr[:, 5, 5] = (1, 1, 1)
    # map coords of those pixels (px+0.1 to stay in-pixel after truncation)
    def m(px, py):
        return (px + 0.1, 10.0 - py - 0.1)
    targets = [m(0, 0), m(9, 0), m(0, 9), m(5, 5)]
    specs, locs = E.endmembers_by_maximum_volume(arr, targets, ndim=3, gt=gt)
    assert specs.shape == (3, 3)
    assert set(locs) == {targets[0], targets[1], targets[2]}
    specs2, locs2 = E.endmembers_by_maximum_area(arr, targets, gt=gt)
    assert len(locs2) == 3
    specs3, locs3 = E.endmembers_by_maximum_angle(
        arr, targets[1:], targets[0], gt=gt)
    assert locs3[0] == targets[0]
    q = arr[0] > 5
    found = E.endmembers_by_query(arr, q, gt)
    assert found == [(0.0, 10.0)]


def test_ppi_partial_merge_equals_global():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(500, 4))
    sk = E.ppi_skewers(4, 200)
    whole = E.ppi_block_extremes(X, sk)
    gmin, gmax = E.ppi_merge_extremes([(0, whole)])
    counts_global = E.ppi_counts_from_extremes(gmin, gmax, 500)
    parts = [(0, E.ppi_block_extremes(X[:200], sk)),
             (200, E.ppi_block_extremes(X[200:], sk))]
    gmin2, gmax2 = E.ppi_merge_extremes(parts)
    counts_split = E.ppi_counts_from_extremes(gmin2, gmax2, 500)
    assert np.array_equal(counts_global, counts_split)
    idx, counts = E.ppi(X, q=5)
    assert len(idx) == 5
    assert (counts[idx[0]] >= counts).all()


def test_nfindr_finds_planted_simplex():
    rng = np.random.default_rng(6)
    corners = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    A = rng.dirichlet([1, 1, 1], size=400)
    X = A @ corners
    X = np.vstack([X, corners])  # ensure pure pixels exist
    idx, vol = E.nfindr(np.hstack([X, np.zeros((X.shape[0], 1))]), q=3)
    found = X[idx]
    for c in corners:
        assert (np.linalg.norm(found - c, axis=1) < 1e-9).any()

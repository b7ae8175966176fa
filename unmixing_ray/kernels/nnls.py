"""Fully-constrained least squares (FCLS) abundance estimation, pure numpy.

The reference delegates to ``pysptools.abundance_maps.FCLS``
(lsma.py:38,150-157), which solves, per pixel x with endmember matrix
U (q endmembers × p bands):

    min_a || U'a - x ||^2   s.t.  a >= 0,  sum(a) = 1

Re-implemented here from the published problem definition (Heinz & Chang
2001, "Fully constrained least squares linear spectral mixture analysis")
rather than the pysptools code:

- ``fcls_exact``: exact active-set enumeration. The FCLS objective is a
  strictly convex QP; its optimum is the unique point satisfying the KKT
  conditions for exactly one support set P. For small q (the reference uses
  q=3) we enumerate all 2^q−1 candidate supports in a fixed canonical
  order, solve the equality-constrained system for every pixel at once per
  support (one precomputed solve per support, shared across pixels), and
  select the first support whose solution is primal feasible (a_P ≥ 0) and
  dual feasible (reduced gradients ≥ 0). Deterministic by construction and
  independent of pixel order / batching — the engine analogue of the
  reference's 1-process == 2-process bit-for-bit pin (test/tests.py:62-82).
- ``nnls_lh``: Lawson–Hanson NNLS with deterministic lowest-index
  tie-breaking, used for the sum-to-one-augmented formulation when q is
  large (delta-weighted augmentation after Heinz & Chang).

``fcls_pixels`` is the batch entry: (c, k) pixel block × (q, k) endmembers
→ (c, q) abundances.
"""

from __future__ import annotations

import itertools

import numpy as np

_EPS = 1e-10


def _supports(q):
    """Canonical support enumeration: by descending size, then lexicographic.

    Full support first so the interior solution (the common case) is found
    immediately.
    """
    out = []
    for size in range(q, 0, -1):
        for comb in itertools.combinations(range(q), size):
            out.append(comb)
    return out


def fcls_exact(X, U):
    """Exact FCLS for all pixels at once. X: (c, k) data; U: (q, k)
    endmembers. Returns (c, q) float64 abundances."""
    X = np.asarray(X, dtype=np.float64)
    U = np.asarray(U, dtype=np.float64)
    c, k = X.shape
    q = U.shape[0]
    G = U @ U.T                      # (q, q) Gram
    B = X @ U.T                      # (c, q) cross products
    out = np.zeros((c, q))
    unsolved = np.ones(c, dtype=bool)
    for P in _supports(q):
        rows = np.nonzero(unsolved)[0]
        if not len(rows):
            break
        idx = np.asarray(P)
        m = len(idx)
        # KKT system for support P with multiplier lam:
        #   [G_PP  1] [a_P ]   [B_P]
        #   [1'    0] [lam ] = [ 1 ]
        # K is pixel-independent: invert once, solve all pixels by matmul.
        K = np.zeros((m + 1, m + 1))
        K[:m, :m] = G[np.ix_(idx, idx)]
        K[:m, m] = 1.0
        K[m, :m] = 1.0
        try:
            Kinv = np.linalg.inv(K)
        except np.linalg.LinAlgError:
            continue
        Brows = B[rows][:, idx]                       # (r, m)
        # sol_j = Kinv[j, :m]·B_P + Kinv[j, m] -> (r, m+1) via one matmul
        sol = Brows @ Kinv[:, :m].T + Kinv[:, m][None, :]
        aP = sol[:, :m]                               # (r, m)
        lam = sol[:, m]                               # (r,)
        primal_ok = (aP >= -_EPS).all(axis=1)
        # dual feasibility on the complement: grad_i = (G a)_i - B_i + lam
        comp = np.setdiff1d(np.arange(q), idx)
        if comp.size:
            grad = aP @ G[np.ix_(idx, comp)] - B[rows][:, comp] \
                + lam[:, None]
            dual_ok = (grad >= -1e-8).all(axis=1)
        else:
            dual_ok = np.ones(len(rows), dtype=bool)
        take = primal_ok & dual_ok
        sel = rows[take]
        if len(sel):
            out[np.repeat(sel, m),
                np.tile(idx, len(sel))] = np.clip(aP[take], 0.0,
                                                  None).ravel()
            unsolved[sel] = False
    if unsolved.any():
        # numerically degenerate pixels: fall back to Lawson-Hanson on the
        # delta-augmented system (deterministic)
        bad = np.where(unsolved)[0]
        delta = 1.0 / max(1e-12, 10.0 * abs(U).max())
        A = np.vstack([delta * U.T, np.ones((1, U.shape[0]))])
        for i in bad:
            b = np.concatenate([delta * X[i], [1.0]])
            out[i] = nnls_lh(A, b)
    return out


def nnls_lh(A, b, max_iter=None):
    """Lawson–Hanson active-set NNLS: min ||Ax − b|| s.t. x ≥ 0, with
    deterministic lowest-index-on-tie pivoting. Published algorithm
    (Lawson & Hanson 1974, ch. 23)."""
    A = np.asarray(A, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n = A.shape[1]
    if max_iter is None:
        max_iter = 3 * n
    x = np.zeros(n)
    P = np.zeros(n, dtype=bool)
    w = A.T @ (b - A @ x)
    it = 0
    tol = 10 * _EPS * np.linalg.norm(A, 1) * (max(A.shape) + 1)
    while (~P).any() and (w[~P] > tol).any() and it < max_iter:
        it += 1
        masked = np.where(~P, w, -np.inf)
        j = int(np.argmax(masked))   # argmax returns lowest index on ties
        P[j] = True
        while True:
            idx = np.where(P)[0]
            s = np.zeros(n)
            s[idx], *_ = np.linalg.lstsq(A[:, idx], b, rcond=None)
            if (s[idx] > tol).all():
                x = s
                break
            neg = idx[s[idx] <= tol]
            with np.errstate(divide="ignore", invalid="ignore"):
                alphas = x[neg] / (x[neg] - s[neg])
            alpha = np.min(alphas)
            x = x + alpha * (s - x)
            P[np.abs(x) < tol] = False
            x[~P] = 0.0
        w = A.T @ (b - A @ x)
    return x


def fcls_pixels(X, U, exact_max_q=8):
    """Batch FCLS entry point: (c, k) pixels × (q, k) endmembers → (c, q).

    Uses exact enumeration for q <= exact_max_q (2^q−1 supports), else the
    delta-augmented Lawson–Hanson per pixel.
    """
    X = np.atleast_2d(np.asarray(X, dtype=np.float64))
    U = np.asarray(U, dtype=np.float64)
    q = U.shape[0]
    if q <= exact_max_q:
        return fcls_exact(X, U)
    delta = 1.0 / max(1e-12, 10.0 * abs(U).max())
    A = np.vstack([delta * U.T, np.ones((1, q))])
    out = np.empty((X.shape[0], q))
    for i in range(X.shape[0]):
        b = np.concatenate([delta * X[i], [1.0]])
        out[i] = nnls_lh(A, b)
    return out


def fcls_pixelwise_endmembers(X, Us):
    """MESMA: per-pixel endmember matrices. X: (c, k); Us: (c, q, k).
    Returns (c, q). Vectorized over pixels per support via batched solves.
    Reference semantics: lsma.py:159-177 (__mesma__/__mesma2__ chunked vs
    pixel-wise variants produce identical values; we implement one exact
    batched form)."""
    X = np.asarray(X, dtype=np.float64)
    Us = np.asarray(Us, dtype=np.float64)
    c, q, k = Us.shape
    G = np.einsum("cqk,crk->cqr", Us, Us)       # (c, q, q)
    B = np.einsum("ck,cqk->cq", X, Us)          # (c, q)
    out = np.zeros((c, q))
    unsolved = np.ones(c, dtype=bool)
    for P in _supports(q):
        if not unsolved.any():
            break
        idx = np.asarray(P)
        m = len(idx)
        rows = np.where(unsolved)[0]
        K = np.zeros((len(rows), m + 1, m + 1))
        K[:, :m, :m] = G[np.ix_(rows, idx, idx)]
        K[:, :m, m] = 1.0
        K[:, m, :m] = 1.0
        rhs = np.empty((len(rows), m + 1))
        rhs[:, :m] = B[np.ix_(rows, idx)]
        rhs[:, m] = 1.0
        try:
            sol = np.linalg.solve(K, rhs[..., None])[..., 0]
        except np.linalg.LinAlgError:
            continue
        aP = sol[:, :m]
        lam = sol[:, m]
        primal_ok = (aP >= -_EPS).all(axis=1)
        comp = np.setdiff1d(np.arange(q), idx)
        if comp.size:
            grad = np.einsum(
                "cij,cj->ci", G[np.ix_(rows, comp, idx)], aP) \
                - B[np.ix_(rows, comp)] + lam[:, None]
            dual_ok = (grad >= -1e-8).all(axis=1)
        else:
            dual_ok = np.ones(len(rows), dtype=bool)
        ok = primal_ok & dual_ok
        sel = rows[ok]
        if sel.size:
            full = np.zeros((len(sel), q))
            full[:, idx] = np.clip(aP[ok], 0.0, None)
            out[sel] = full
            unsolved[sel] = False
    if unsolved.any():
        for i in np.where(unsolved)[0]:
            out[i] = fcls_pixels(X[i:i + 1], Us[i])[0]
    return out

"""Minimum Noise Fraction (MNF) rotation, pure numpy, two-pass friendly.

The reference delegates to ``pysptools.noise.MNF`` inside
``mnf_rotation`` (transform.py:104-118), remapping NoData to 0 first.
Re-implemented from the published algorithm (Green et al. 1988, "A
transformation for ordering multispectral data in terms of image
quality with implications for noise removal"):

1. estimate the noise covariance Σ_N from horizontal shift differences
   d = x[r, c] − x[r, c+1] (Σ_N = cov(d)/2);
2. estimate the data covariance Σ;
3. solve the generalized eigenproblem Σ v = λ Σ_N v via noise whitening;
4. project, components ordered by descending SNR eigenvalue.

Deterministic sign convention: each eigenvector is scaled so its
largest-|.|. coefficient is positive. The distributed form accumulates
per-tile partial statistics (``partial_stats``) that sum exactly to the
whole-image statistics, then ``rotation_from_stats`` runs on the driver
and the rotation matrix is broadcast (SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np

from ..constants import NODATA


def partial_stats(arr, nodata=NODATA):
    """Per-tile partial sums for MNF statistics.

    arr: (p, m, n). NoData remapped to 0 first (reference
    transform.py:112). Returns dict of partials that add across tiles:
    n, s (Σx), ss (Σxx'), dn (# of diff samples), ds (Σd), dss (Σdd').
    Horizontal differences are computed within the tile only, so the
    statistics are exactly reproducible at any tiling/parallelism.
    """
    a = np.asarray(arr, dtype=np.float64).copy()
    a[a == nodata] = 0.0
    p = a.shape[0]
    X = a.reshape(p, -1)
    d = (a[:, :, :-1] - a[:, :, 1:]).reshape(p, -1)
    return {
        "n": X.shape[1],
        "s": X.sum(axis=1),
        "ss": X @ X.T,
        "dn": d.shape[1],
        "ds": d.sum(axis=1),
        "dss": d @ d.T,
    }


def merge_stats(parts):
    """Sum partial stats dicts."""
    out = {k: None for k in ("n", "s", "ss", "dn", "ds", "dss")}
    for part in parts:
        for k in out:
            out[k] = part[k] if out[k] is None else out[k] + part[k]
    return out


def rotation_from_stats(stats):
    """Driver-side: partial stats → (rotation matrix W, eigenvalues).

    Columns of W are the MNF basis vectors; project with X @ W where X is
    (npix, p) mean-centered? No — matching the reference's pysptools use,
    the projection is applied to the raw (NoData→0) values without
    re-centering at apply time; the covariance IS mean-centered here.
    """
    n = stats["n"]
    mean = stats["s"] / n
    cov = stats["ss"] / n - np.outer(mean, mean)
    dmean = stats["ds"] / stats["dn"]
    ncov = (stats["dss"] / stats["dn"] - np.outer(dmean, dmean)) / 2.0
    # noise whitening: Σ_N = E Λ E' → F = E Λ^{-1/2}
    evals, evecs = np.linalg.eigh(ncov)
    evals = np.maximum(evals, 1e-12 * max(1.0, float(evals.max())))
    F = evecs @ np.diag(evals ** -0.5)
    # PCA of whitened data covariance
    M = F.T @ cov @ F
    snr, V = np.linalg.eigh(M)
    order = np.argsort(snr)[::-1]
    snr = snr[order]
    V = V[:, order]
    W = F @ V
    # deterministic sign: largest-|coef| positive per column
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    return W, snr


def apply_rotation(arr, W, nodata=NODATA):
    """Project a (p, m, n) tile with the broadcast rotation → (p, m, n)
    float64 MNF components (component index = band axis)."""
    a = np.asarray(arr, dtype=np.float64).copy()
    a[a == nodata] = 0.0
    p = a.shape[0]
    X = a.reshape(p, -1)
    out = W.T @ X
    return out.reshape(a.shape)


def mnf_rotation(arr, nodata=NODATA):
    """Single-array convenience (reference transform.py:104-118 signature):
    returns the transformed cube in HSI form (n, m, p) like the
    reference."""
    stats = partial_stats(arr, nodata)
    W, _ = rotation_from_stats(stats)
    proj = apply_rotation(arr, W, nodata)
    return proj.T


def covariance_partials(arr, nodata=NODATA):
    """Partial (n, Σx, Σxx') for the distributed covariance / eigenvalue
    scree aggregate (visualize.py:265-277 analogue)."""
    a = np.asarray(arr, dtype=np.float64)
    p = a.shape[0]
    X = a.reshape(p, -1)
    valid = (X != nodata).all(axis=0)
    X = X[:, valid]
    return {"n": X.shape[1], "s": X.sum(axis=1), "ss": X @ X.T}


def eigenvalues_from_partials(parts):
    """Merged covariance partials → descending eigenvalues (scree)."""
    merged = None
    for part in parts:
        if merged is None:
            merged = {k: np.array(v) for k, v in part.items()}
        else:
            for k in merged:
                merged[k] = merged[k] + part[k]
    n = merged["n"]
    mean = merged["s"] / n
    cov = merged["ss"] / n - np.outer(mean, mean)
    evals = np.linalg.eigvalsh(cov)
    return evals[::-1]

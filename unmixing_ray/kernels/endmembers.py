"""Endmember induction and combinatorial endmember search, pure numpy.

- ``convex_hull_graham``: Graham scan (reference lsma.py:333-364; standard
  published algorithm, re-implemented with the same sort + keep-left
  semantics and CCW output order).
- ``endmembers_by_maximum_angle/area/volume`` + combination iteration:
  reference lsma.py:367-498/587-655, operating on spectra gathered at
  map coordinates.
- ``ppi_counts`` / ``ppi_select``: Pixel Purity Index with a SHARED seeded
  skewer matrix so per-block partial extremity counts sum to the global
  answer (reference uses pysptools.eea.PPI, lsma.py:118-119; algorithm
  from Boardman et al. 1995).
- ``nfindr``: N-FINDR simplex-volume maximization (reference uses
  pysptools.eea.NFINDR, lsma.py:122-123; algorithm from Winter 1999),
  deterministic (sequential replacement until no improvement).
"""

from __future__ import annotations

import itertools
from functools import reduce

import numpy as np

from .pixels import spectra_at_xy


def convex_hull_graham(points, indices=False):
    """Graham scan, CCW hull. Same contract as reference lsma.py:333-364."""
    def cmp(a, b):
        return (a > b) - (a < b)

    def turn(p, q, r):
        return cmp((q[0] - p[0]) * (r[1] - p[1])
                   - (r[0] - p[0]) * (q[1] - p[1]), 0)

    def keep_left(hull, r):
        while len(hull) > 1 and turn(hull[-2], hull[-1], r) != 1:
            hull.pop()
        if not len(hull) or hull[-1] != r:
            hull.append(r)
        return hull

    pts_sorted = sorted(points)
    lower = reduce(keep_left, pts_sorted, [])
    upper = reduce(keep_left, reversed(pts_sorted), [])
    hull = lower + [upper[i] for i in range(1, len(upper) - 1)]
    if indices:
        return ([points.index(h) for h in hull], hull)
    return hull


def _angle_between(v1, v2):
    v1u = v1 / np.linalg.norm(v1)
    v2u = v2 / np.linalg.norm(v2)
    return np.arccos(np.clip(np.dot(v1u, v2u), -1.0, 1.0))


def endmembers_by_maximum_angle(rast, targets, ref_target, gt):
    """Triad maximizing the angle at a fixed reference point in the first
    two feature dimensions. Reference: lsma.py:367-429."""
    ref_spec = spectra_at_xy(rast, (ref_target,), gt)[..., 0:2].reshape((2,))
    target_specs = spectra_at_xy(rast, targets, gt)[..., 0:2]
    combos = list(itertools.combinations(range(max(target_specs.shape)), 2))
    spec_map = [[target_specs[i, :] for i in pair] for pair in combos]
    coord_map = [[targets[i] for i in pair] for pair in combos]
    vectors = [(ref_spec - a, ref_spec - b) for a, b in spec_map]
    angles = [_angle_between(v1, v2) for v1, v2 in vectors]
    idx = angles.index(max(angles))
    specs = list(spec_map[idx])
    locs = list(coord_map[idx])
    specs.insert(0, ref_spec)
    locs.insert(0, ref_target)
    return (np.array(specs), locs)


def iterate_endmember_combinations(rast, targets, ref_target=None, ndim=3,
                                   gt=None):
    """All candidate endmember combinations: pool (list input) or one-per-
    group (dict input). Reference: lsma.py:587-655."""
    if isinstance(targets, dict):
        target_specs = {}
        for label in targets:
            target_specs[label] = spectra_at_xy(
                rast, targets[label], gt)[..., 0:ndim]
        if ref_target is not None:
            if ndim != len(targets) + 1:
                raise ValueError(
                    "number of groups must be ndim-1 with ref_target")
            ref_spec = spectra_at_xy(
                rast, (ref_target,), gt)[..., 0:ndim].reshape((ndim,))
        spec_map = list(itertools.product(
            *[target_specs[label] for label in target_specs]))
        coord_map = list(itertools.product(
            *[targets[label] for label in targets]))
    else:
        target_specs = spectra_at_xy(rast, targets, gt)[..., 0:ndim]
        ncom = ndim - (1 if ref_target is not None else 0)
        if ref_target is not None:
            ref_spec = spectra_at_xy(
                rast, (ref_target,), gt)[..., 0:ndim].reshape((ndim,))
        combos = list(itertools.combinations(
            range(max(target_specs.shape)), ncom))
        spec_map = [[target_specs[i, :] for i in c] for c in combos]
        coord_map = [[targets[i] for i in c] for c in combos]
    if ref_target is not None:
        spec_map = [list(s) for s in spec_map]
        for spec in spec_map:
            spec.insert(0, ref_spec)
    return (spec_map, coord_map)


def endmembers_by_maximum_area(rast, targets, area_dim=2, gt=None):
    """Top-1 triangle area over all combinations. Reference:
    lsma.py:432-458."""
    def area(a, b, c):
        return 0.5 * np.linalg.norm(np.cross(b - a, c - a))

    spec_map, coord_map = iterate_endmember_combinations(
        rast, targets, ref_target=None, ndim=3, gt=gt)
    areas = [area(*[np.asarray(f[0:area_dim], dtype=np.float64)
                    for f in each]) for each in spec_map]
    idx = areas.index(max(areas))
    return (np.array(spec_map[idx]), list(coord_map[idx]))


def endmembers_by_maximum_volume(rast, targets, ref_target=None, ndim=3,
                                 gt=None):
    """Top-1 |det| simplex volume. Reference: lsma.py:461-498."""
    spec_map, coord_map = iterate_endmember_combinations(
        rast, targets, ref_target, ndim, gt)
    volumes = [abs(np.linalg.det(np.asarray(s, dtype=np.float64)))
               for s in spec_map]
    idx = volumes.index(max(volumes))
    specs = np.array(spec_map[idx])
    locs = list(coord_map[idx])
    if ref_target is not None:
        locs.insert(0, ref_target)
    return (specs, locs)


def endmembers_by_query(rast, query, gt):
    """Feature-space boolean query → map coordinates of matching pixels.
    Reference: lsma.py:501-520 (same y,x → (x,y) ordering)."""
    from ..geo import pixel_to_xy
    rast = np.asarray(rast)
    shp = rast.shape
    idx = np.indices((shp[-2], shp[-1]))
    return list(pixel_to_xy([(x, y) for y, x in idx[:, query].T], gt))


# ---------------------------------------------------------------------------
# PPI (distributed-friendly: shared seeded skewers, partial counts)

def ppi_skewers(p, num_skewers, seed=99):
    """The shared random skewer matrix (num_skewers, p); every partition
    must use the same seed so partial counts add."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, p,
                                                        num_skewers]))
    sk = rng.normal(size=(num_skewers, p))
    sk /= np.linalg.norm(sk, axis=1, keepdims=True)
    return sk


def ppi_block_extremes(X, skewers):
    """Per-block PPI partials: for each skewer, the (argmin, argmax) row
    index *within this block* plus the projected values, so blocks merge
    exactly: (min_idx, min_val, max_idx, max_val) arrays of len
    num_skewers. X: (n, p)."""
    proj = X @ skewers.T                     # (n, s)
    imin = np.argmin(proj, axis=0)
    imax = np.argmax(proj, axis=0)
    s = np.arange(skewers.shape[0])
    return imin, proj[imin, s], imax, proj[imax, s]


def ppi_merge_extremes(parts):
    """Merge per-block extremes: parts is a list of
    (global_row_offset, (imin, vmin, imax, vmax)). Ties break toward the
    lowest global row index (deterministic). Returns (gmin_idx, gmax_idx)
    arrays of global row indices per skewer."""
    best_min_v = None
    for offset, (imin, vmin, imax, vmax) in parts:
        gi_min = imin + offset
        gi_max = imax + offset
        if best_min_v is None:
            best_min_v, best_min_i = vmin.copy(), gi_min.copy()
            best_max_v, best_max_i = vmax.copy(), gi_max.copy()
            continue
        lt = (vmin < best_min_v) | ((vmin == best_min_v)
                                    & (gi_min < best_min_i))
        best_min_i = np.where(lt, gi_min, best_min_i)
        best_min_v = np.where(lt, vmin, best_min_v)
        gtr = (vmax > best_max_v) | ((vmax == best_max_v)
                                     & (gi_max < best_max_i))
        best_max_i = np.where(gtr, gi_max, best_max_i)
        best_max_v = np.where(gtr, vmax, best_max_v)
    return best_min_i, best_max_i


def ppi_counts_from_extremes(gmin, gmax, n):
    """Extremity counts per pixel row from merged per-skewer extremes."""
    counts = np.zeros(n, dtype=np.int64)
    np.add.at(counts, gmin, 1)
    np.add.at(counts, gmax, 1)
    return counts


def ppi(X, q, num_skewers=10000, seed=99):
    """Single-array PPI: top-q pixels by extremity count (count desc, then
    row index asc — deterministic). Returns (indices, counts)."""
    X = np.asarray(X, dtype=np.float64)
    sk = ppi_skewers(X.shape[1], num_skewers, seed)
    parts = [(0, ppi_block_extremes(X, sk))]
    gmin, gmax = ppi_merge_extremes(parts)
    counts = ppi_counts_from_extremes(gmin, gmax, X.shape[0])
    order = np.lexsort((np.arange(len(counts)), -counts))
    return order[:q], counts


# ---------------------------------------------------------------------------
# N-FINDR

def _simplex_volume_matrix(E):
    """(q, q-1) reduced endmember coords → |det| of the bordered matrix."""
    q = E.shape[0]
    M = np.ones((q, q))
    M[:, 1:] = E
    return abs(np.linalg.det(M))


def nfindr(X, q, max_iter=10):
    """N-FINDR (Winter 1999): find q rows of X spanning the maximum-volume
    simplex in the first (q-1) dims. Deterministic: seeds with a greedy
    farthest-point init, then sequential replacement sweeps; each sweep
    position evaluates ALL candidate replacements with one batched
    np.linalg.det call (the scalar-loop version cost ~12 s on a 240k
    candidate pool; this is milliseconds)."""
    X = np.asarray(X, dtype=np.float64)[:, : q - 1]
    n = X.shape[0]
    # deterministic init: greedy farthest-point
    idx = [int(np.argmax(np.linalg.norm(X, axis=1)))]
    for _ in range(q - 1):
        d = np.min(
            np.linalg.norm(X[:, None, :] - X[idx][None, :, :], axis=2),
            axis=1)
        idx.append(int(np.argmax(d)))
    idx = list(idx[:q])
    vol = _simplex_volume_matrix(X[idx])
    ones = np.ones((n, q, 1))
    for _ in range(max_iter):
        improved = False
        for j in range(q):
            cur = idx[j]
            # batched: bordered matrix with row j replaced by every
            # candidate at once -> (n,) volumes in one det call
            E = X[idx]                                  # (q, q-1)
            M = np.broadcast_to(E, (n, q, q - 1)).copy()
            M[:, j, :] = X
            vols = np.abs(np.linalg.det(
                np.concatenate([ones, M], axis=2)))
            vols[np.asarray(idx)] = -np.inf  # never pick current members
            best_i = int(np.argmax(vols))    # lowest index on ties
            if vols[best_i] > vol + 1e-12:
                idx[j] = best_i
                vol = vols[best_i]
                improved = True
        if not improved:
            break
    return np.asarray(idx), vol

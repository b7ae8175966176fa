"""Distributed convex hull of masked pixel sets — the hull-of-hulls
combiner.

The geometric reduction Ray Data has no primitive for: the convex hull
of a point set distributed across tiles. The plan exploits that a hull
VERTEX of a union is a hull vertex of whichever subset contains it, so

1. per-batch combiner: each TILE reduces its masked pixels to its own
   strict hull vertices (a dense 32×32 tile collapses to ~4 corners —
   the exchange carries O(hull) rows per tile, never pixels);
2. ONE ``groupby(image_id)`` gathers candidate vertices and re-runs
   the same exact integer monotone chain on the union.

Exactness: integer coordinates, integer cross products, STRICT turns
(collinear boundary points are excluded), so the minimal vertex set is
unique and the outputs — vertex count, doubled shoelace area, and the
order-independent position checksum Σ(x·100003 + y) — are bit-stable
at any partitioning. The sidecar oracle
(synth.generate_hull_expected) recomputes each image's hull with a
DIFFERENT algorithm (gift wrapping) over a full-image decode.

Reference analogue: kernels/endmembers.py:convex_hull_graham covers
the reference's float spectral-space hull (lsma.py); this operator is
the engine-new spatial/integer form with the distribution story.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..constants import NODATA
from .decode import binary_views


def _cross(o, a, b):
    return ((a[0] - o[0]) * (b[1] - o[1])
            - (a[1] - o[1]) * (b[0] - o[0]))


def hull_monotone(pts):
    """Strict convex hull (minimal vertex set) of integer points via
    Andrew's monotone chain. ``pts``: (n, 2) int64, any order, dups
    allowed. Returns the vertex array in counter-clockwise order
    starting at the lexicographic minimum; degenerate inputs return
    the 1 or 2 extreme points."""
    pts = np.unique(np.asarray(pts, dtype=np.int64), axis=0)
    n = len(pts)
    if n <= 2:
        return pts
    P = [tuple(p) for p in pts]          # lexicographically sorted
    lower = []
    for p in P:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(P):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:                     # all points collinear
        return np.array([P[0], P[-1]], dtype=np.int64)
    return np.array(hull, dtype=np.int64)


def _area2(hull):
    """Doubled shoelace area of a CCW vertex ring (0 for degenerate)."""
    if len(hull) < 3:
        return 0
    x, y = hull[:, 0], hull[:, 1]
    return int((x * np.roll(y, -1) - np.roll(x, -1) * y).sum())


def _hull_candidates(tiles, band, threshold):
    """Stage 1 shared by image_hulls / simplified_hulls: per-tile
    strict hull vertices of the masked pixels (the combiner)."""

    def tile_hulls(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bd = batch["bands"].to_numpy()
        row_off = batch["row_off"].to_numpy()
        col_off = batch["col_off"].to_numpy()
        imgs = batch["image_id"].to_pylist()
        out_img, out_x, out_y = [], [], []
        for i in range(batch.num_rows):
            arr = values[offsets[i]:offsets[i + 1]].reshape(
                (int(bd[i]), int(hs[i]), int(ws[i])))
            z = arr[band]
            ii, jj = np.nonzero((z != NODATA) & (z > threshold))
            if not len(ii):
                continue
            pts = np.stack([jj + int(col_off[i]),
                            ii + int(row_off[i])], axis=1)
            h = hull_monotone(pts)
            out_img.extend([imgs[i]] * len(h))
            out_x.extend(h[:, 0].tolist())
            out_y.extend(h[:, 1].tolist())
        return pa.table({
            "image_id": pa.array(out_img, pa.string()),
            "x": pa.array(out_x, pa.int64()),
            "y": pa.array(out_y, pa.int64())})

    return tiles.select_columns(
        ["image_id", "row_off", "col_off", "pixels", "bands", "h",
         "w"]).map_batches(tile_hulls, batch_format="pyarrow")


def image_hulls(tiles, band=0, threshold=2000):
    """Per-image strict convex hull of the pixels with band value >
    ``threshold`` (NODATA excluded); see module docstring. Returns
    (image_id, n_hull, area2, hull_wsum)."""
    cand = _hull_candidates(tiles, band, threshold)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        pts = np.stack([g["x"].to_numpy(np.int64),
                        g["y"].to_numpy(np.int64)], axis=1)
        h = hull_monotone(pts)
        wsum = int((h[:, 0] * np.int64(100003) + h[:, 1]).sum())
        return pd.DataFrame({
            "image_id": [g["image_id"].iloc[0]],
            "n_hull": [len(h)],
            "area2": [abs(_area2(h))],
            "hull_wsum": [wsum]}).astype(
            {"n_hull": "int64", "area2": "int64",
             "hull_wsum": "int64"})

    return cand.groupby("image_id").map_groups(final,
                                               batch_format="pandas")


def hull_gift_wrap(pts):
    """INDEPENDENT strict hull for oracles/tests: Jarvis gift wrapping
    with the farthest-point rule on collinear candidates (so boundary
    mid-points are excluded, matching hull_monotone's minimal set)."""
    pts = np.unique(np.asarray(pts, dtype=np.int64), axis=0)
    n = len(pts)
    if n <= 2:
        return pts
    P = [tuple(p) for p in pts]
    start = min(P)
    hull = [start]
    cur = start
    while True:
        nxt = None
        for c in P:
            if c == cur:
                continue
            if nxt is None:
                nxt = c
                continue
            cr = _cross(cur, nxt, c)
            if cr < 0:
                nxt = c
            elif cr == 0:
                d_n = ((nxt[0] - cur[0]) ** 2 + (nxt[1] - cur[1]) ** 2)
                d_c = ((c[0] - cur[0]) ** 2 + (c[1] - cur[1]) ** 2)
                if d_c > d_n:
                    nxt = c
        if nxt == start or nxt is None:
            break
        hull.append(nxt)
        cur = nxt
        if len(hull) > n:
            raise RuntimeError("gift wrap failed to terminate")
    return np.array(hull, dtype=np.int64)


def chains_of(hull_set):
    """Split a convex hull vertex SET into its two x-monotone chains
    between the lexicographic extremes — the canonical decomposition a
    ring-order-agnostic Douglas–Peucker needs (both chains run
    min → max, so the result is a pure function of the vertex set, not
    of whichever algorithm's ring order produced it)."""
    pts = np.unique(np.asarray(hull_set, dtype=np.int64), axis=0)
    if len(pts) <= 2:
        return [pts]
    P = [tuple(p) for p in pts]
    vmin, vmax = P[0], P[-1]
    above, below = [], []
    for p in P[1:-1]:
        if _cross(vmin, vmax, p) > 0:
            above.append(p)
        else:
            below.append(p)
    return [np.array([vmin] + above + [vmax], dtype=np.int64),
            np.array([vmin] + below + [vmax], dtype=np.int64)]


def dp_simplify_chain(chain, eps):
    """Douglas–Peucker over an ordered chain with EXACT integer
    geometry: a split happens at the point maximizing the doubled
    triangle area cross(a, b, p)² iff cross² > eps² · |b−a|² (the
    perpendicular-distance test cleared of the division; strictly-
    greater splits, argmax ties break to the smallest index).
    Iterative stack — no recursion limits. Returns the kept vertex
    array in chain order."""
    chain = np.asarray(chain, dtype=np.int64)
    n = len(chain)
    if n <= 2:
        return chain
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    e2 = int(eps) * int(eps)
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        pa_, pb = chain[a], chain[b]
        seg2 = int((pb[0] - pa_[0]) ** 2 + (pb[1] - pa_[1]) ** 2)
        best_i, best_c2 = -1, -1
        for i in range(a + 1, b):
            c = int(_cross(tuple(pa_), tuple(pb), tuple(chain[i])))
            c2 = c * c
            if c2 > best_c2:
                best_i, best_c2 = i, c2
        if best_c2 > e2 * seg2:
            keep[best_i] = True
            stack.append((a, best_i))
            stack.append((best_i, b))
    return chain[keep]


def simplified_hulls(tiles, band=0, threshold=2000, eps=2):
    """image_hulls composed with exact Douglas–Peucker simplification
    of the hull ring (split into canonical chains, each chain
    DP-simplified with integer comparisons). The vector
    generalization-for-serving op (render/index fewer vertices).
    Returns (image_id, n_hull, n_simplified, simp_wsum)."""

    cand = _hull_candidates(tiles, band, threshold)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        pts = np.stack([g["x"].to_numpy(np.int64),
                        g["y"].to_numpy(np.int64)], axis=1)
        h = hull_monotone(pts)
        kept = {}
        for chain in chains_of(h):
            for p in dp_simplify_chain(chain, eps):
                kept[(int(p[0]), int(p[1]))] = True
        ks = np.array(sorted(kept), dtype=np.int64)
        wsum = int((ks[:, 0] * np.int64(100003) + ks[:, 1]).sum())
        return pd.DataFrame({
            "image_id": [g["image_id"].iloc[0]],
            "n_hull": [len(h)],
            "n_simplified": [len(ks)],
            "simp_wsum": [wsum]}).astype(
            {"n_hull": "int64", "n_simplified": "int64",
             "simp_wsum": "int64"})

    return cand.groupby("image_id").map_groups(final,
                                               batch_format="pandas")

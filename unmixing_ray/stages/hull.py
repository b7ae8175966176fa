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


def image_hulls(tiles, band=0, threshold=2000):
    """Per-image strict convex hull of the pixels with band value >
    ``threshold`` (NODATA excluded); see module docstring. Returns
    (image_id, n_hull, area2, hull_wsum)."""

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

    cand = tiles.select_columns(
        ["image_id", "row_off", "col_off", "pixels", "bands", "h",
         "w"]).map_batches(tile_hulls, batch_format="pyarrow")

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

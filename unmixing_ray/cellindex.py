"""Self-contained hierarchical spatial cell index (H3/S2 stand-in).

Engine-new (the reference has no spatial index; tiling/joining is the web-
scale graft). Pure numpy, deterministic, no external deps: an S2-style
quadtree over a fixed projected grid. A cell id packs
``(level, morton(ix, iy))`` into a uint64:

    bits 58..63 : level (0..28)
    bits  0..57 : Morton-interleaved (ix, iy), 29 bits each

The grid anchors at ``GRID_ORIGIN`` with level-0 cells of ``GRID_SPAN``
meters on a side; each level halves the cell edge. ``iy`` grows northward.
All operations (encode, decode, parent, children, neighbors, cover of a
bbox) are vectorized so cell assignment inside ``map_batches`` is a few
numpy ops per batch.
"""

from __future__ import annotations

import numpy as np

# Anchor of the global grid in the engine's working projected CRS (a
# UTM-like meters grid; matches the synthetic corpus layout).
GRID_ORIGIN_X = 0.0
GRID_ORIGIN_Y = 0.0
# Level-0 cell edge in meters: 2^29 * 1 m grid unit would overflow typical
# UTM extents; instead use a 2^22 m (~4194 km) level-0 so level 20 is 4 m
# and level 11 is ~2 km. With 30 m pixels and 64 px tiles (1920 m), the
# natural tile-grid level is 11 (2048 m) .. 12 (1024 m).
GRID_SPAN = float(2 ** 22)

MAX_LEVEL = 28
_LEVEL_SHIFT = 58
_MORTON_MASK = (1 << _LEVEL_SHIFT) - 1


def _part1by1(v):
    """Spread the low 29 bits of v so there is a zero bit between each."""
    v = np.asarray(v, dtype=np.uint64)
    v = v & np.uint64(0x1FFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1FFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x1F00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x1555555555555555)
    return v


def _compact1by1(v):
    v = np.asarray(v, dtype=np.uint64)
    v = v & np.uint64(0x1555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x1333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x10F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x1F00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x1FFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x1FFFFFFF)
    return v


def cell_from_ixiy(ix, iy, level):
    """Pack integer grid coordinates at ``level`` into uint64 cell ids."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level out of range")
    m = _part1by1(ix) | (_part1by1(iy) << np.uint64(1))
    return m | (np.uint64(level) << np.uint64(_LEVEL_SHIFT))


def cell_to_ixiy(cell):
    """Unpack cell ids → (ix, iy, level)."""
    cell = np.asarray(cell, dtype=np.uint64)
    level = (cell >> np.uint64(_LEVEL_SHIFT)).astype(np.int64)
    m = cell & np.uint64(_MORTON_MASK)
    ix = _compact1by1(m).astype(np.int64)
    iy = _compact1by1(m >> np.uint64(1)).astype(np.int64)
    return ix, iy, level


def cell_edge(level):
    """Edge length (meters) of a cell at ``level``."""
    return GRID_SPAN / float(2 ** level)


def cell_of_xy(x, y, level):
    """Vectorized: map coordinates → containing cell id at ``level``.

    Coordinates left/below the grid origin are clamped to 0 (the grid is
    anchored so real corpora are inside it).
    """
    edge = cell_edge(level)
    ix = np.floor((np.asarray(x, dtype=np.float64) - GRID_ORIGIN_X) / edge)
    iy = np.floor((np.asarray(y, dtype=np.float64) - GRID_ORIGIN_Y) / edge)
    ix = np.clip(ix, 0, 2 ** level - 1).astype(np.uint64)
    iy = np.clip(iy, 0, 2 ** level - 1).astype(np.uint64)
    return cell_from_ixiy(ix, iy, level)


def cell_bounds(cell):
    """(xmin, ymin, xmax, ymax) arrays of each cell's extent."""
    ix, iy, level = cell_to_ixiy(cell)
    edge = GRID_SPAN / np.power(2.0, level)
    xmin = GRID_ORIGIN_X + ix * edge
    ymin = GRID_ORIGIN_Y + iy * edge
    return xmin, ymin, xmin + edge, ymin + edge


def cell_center(cell):
    xmin, ymin, xmax, ymax = cell_bounds(cell)
    return (xmin + xmax) / 2.0, (ymin + ymax) / 2.0


def parent(cell, steps=1):
    """Parent cell(s) ``steps`` levels up. Requires uniform input level."""
    ix, iy, level = cell_to_ixiy(cell)
    levels = np.unique(np.atleast_1d(level))
    if levels.size != 1:
        raise ValueError("parent() requires cells of a single level")
    new_level = int(levels[0]) - steps
    if new_level < 0:
        raise ValueError("cannot take parent above level 0")
    return cell_from_ixiy(
        (ix >> steps).astype(np.uint64),
        (iy >> steps).astype(np.uint64),
        new_level,
    )


def children(cell):
    """The four child cells (one level down) of a scalar cell id."""
    ix, iy, level = cell_to_ixiy(np.uint64(cell))
    ix, iy, level = int(ix), int(iy), int(level)
    out = []
    for dy in (0, 1):
        for dx in (0, 1):
            out.append(int(cell_from_ixiy(
                np.uint64(2 * ix + dx), np.uint64(2 * iy + dy), level + 1)))
    return out


def neighbors(cell, ring=1):
    """All cells within ``ring`` king-moves of a scalar cell (excluding it),
    used for kNN ring expansion across partition borders."""
    ix, iy, level = cell_to_ixiy(np.uint64(cell))
    ix, iy, level = int(ix), int(iy), int(level)
    n = 2 ** level
    out = []
    for dy in range(-ring, ring + 1):
        for dx in range(-ring, ring + 1):
            if dx == 0 and dy == 0:
                continue
            jx, jy = ix + dx, iy + dy
            if 0 <= jx < n and 0 <= jy < n:
                out.append(int(cell_from_ixiy(
                    np.uint64(jx), np.uint64(jy), level)))
    return out


def cover_bbox(xmin, ymin, xmax, ymax, level):
    """All cell ids at ``level`` intersecting an axis-aligned bbox
    (scalar bbox → python list). Used to partition polygons by cell."""
    edge = cell_edge(level)
    i0 = max(0, int(np.floor((xmin - GRID_ORIGIN_X) / edge)))
    i1 = min(2 ** level - 1, int(np.floor((xmax - GRID_ORIGIN_X) / edge)))
    j0 = max(0, int(np.floor((ymin - GRID_ORIGIN_Y) / edge)))
    j1 = min(2 ** level - 1, int(np.floor((ymax - GRID_ORIGIN_Y) / edge)))
    out = []
    for jy in range(j0, j1 + 1):
        for jx in range(i0, i1 + 1):
            out.append(int(cell_from_ixiy(np.uint64(jx), np.uint64(jy), level)))
    return out

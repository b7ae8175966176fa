"""Distributed contour extraction (marching squares) over tiled rasters.

The isoline primitive of every GIS stack (elevation contours, NDVI
isopleths, plume boundaries): classify each 2×2 pixel cell of band 0
against a threshold into one of 16 marching-squares cases and count the
contour segments the case emits. Cells whose bottom/right corners live
in the NEIGHBORING tile are exactly the cross-tile problem the engine's
halo exchange exists for — radius-1 strips (the same stage A as
stages/focal.py / terrain.py, band-0 pruned) give every tile the one
extra row/column it needs, so the exchange moves ~1.13× of one band,
never whole images.

Cell ownership: a 2×2 cell belongs to the tile containing its ANCHOR
(top-left) pixel; cells at the image's last row/column have no
bottom/right corner and do not exist. Case code = TL·1 + TR·2 + BL·4 +
BR·8 with bit = (value ≥ threshold); segment count per case is the
standard marching-squares table (the two saddle cases — opposite
corners above threshold — emit 2 segments, empty/full emit 0, every
other case 1).

Output per tile is an exact-int64 summary that pins every cell's case,
not just totals: ``case_checksum`` weights each case code by its
tile-local anchor position (the stages/augment.py position-weight
discipline), so a transposed or shifted assembly cannot hash-match.
Oracle: ``sources/synth.py:generate_contour_expected`` replays the spec
FULL-IMAGE single-machine — a match proves the halo plumbing.

Reference analogue: the reference rasters are whole in-RAM arrays and
isolines are delegated to GDAL/matplotlib viz; there is no reference
kernel to copy — this operator exists for the tiled-at-scale regime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .focal import make_halo_explode
from .terrain import _padded_dem, dem_only

# segments emitted per marching-squares case; in this encoding
# (TL=1, TR=2, BL=4, BR=8) the saddles are cases 6 (TR+BL) and
# 9 (TL+BR), each emitting 2 segments
SEGS_PER_CASE = np.array([0, 1, 1, 1, 1, 1, 2, 1,
                          1, 2, 1, 1, 1, 1, 1, 0], dtype=np.int64)

# position-weight cycle (shared with the sidecar oracle)
W_CYCLE = 251
TILE_WEIGHT_STRIDE = 32   # weights use the engine's TILE constant


def cell_cases(dem: np.ndarray, valid: np.ndarray, threshold: int):
    """(case, ok) fields on the (H−1, W−1) anchor grid of a padded
    plane: case in 0..15, ok = all four corners valid."""
    b = (dem >= np.int64(threshold)).astype(np.int64)
    tl = b[:-1, :-1]
    tr = b[:-1, 1:]
    bl = b[1:, :-1]
    br = b[1:, 1:]
    case = tl + 2 * tr + 4 * bl + 8 * br
    ok = (valid[:-1, :-1] & valid[:-1, 1:]
          & valid[1:, :-1] & valid[1:, 1:])
    return case, ok


def make_contour_assemble(threshold=2500):
    """Stage B: one band-0 tile + halo strips → per-tile contour
    summary (n_cells, n_segments, case_checksum)."""

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "tile_id": pd.Series([], dtype=object),
            "n_cells": pd.Series([], dtype="int64"),
            "n_segments": pd.Series([], dtype="int64"),
            "case_checksum": pd.Series([], dtype="int64")}
        got = _padded_dem(g)
        if got is None:
            return pd.DataFrame(empty)
        m, dem, valid = got
        H, W = int(m["h"]), int(m["w"])
        # anchors owned by this tile sit at padded rows 1..H, cols 1..W
        case, ok = cell_cases(dem, valid, threshold)
        case = case[1:1 + H, 1:1 + W]
        ok = ok[1:1 + H, 1:1 + W]
        ly, lx = np.mgrid[0:H, 0:W]
        wts = (ly * TILE_WEIGHT_STRIDE + lx) % W_CYCLE + 1
        return pd.DataFrame({
            "tile_id": [m["tile_id"]],
            "n_cells": pd.Series([int(ok.sum())], dtype="int64"),
            "n_segments": pd.Series(
                [int((SEGS_PER_CASE[case] * ok).sum())], dtype="int64"),
            "case_checksum": pd.Series(
                [int((case * wts * ok).sum())], dtype="int64")})

    return assemble


def contour_tiles(tiles, threshold=2500):
    """Distributed marching-squares contour summary per tile (see
    module docstring): band-0 prune → radius-1 halo exchange → one
    group per tile."""
    exploded = tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h", "w",
         "bands", "pixels"]) \
        .map_batches(dem_only, batch_format="pyarrow") \
        .map_batches(make_halo_explode(1), batch_format="pyarrow")
    return exploded.groupby(["image_id", "key_row", "key_col"]) \
        .map_groups(make_contour_assemble(threshold),
                    batch_format="pandas")

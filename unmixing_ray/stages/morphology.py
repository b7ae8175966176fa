"""Raster morphology: saturated distance transform via halo exchange.

``distance_to_nodata_tiles`` computes, per pixel, the Chebyshev
distance to the nearest NODATA pixel of the same image, SATURATED at
``radius + 1`` (the "how far from a cloud/gap am I" masking primitive —
buffer-around-nodata, erosion margins, edge-of-swath trims; the
reference family does this with whole-raster scipy morphology, see
clean_mask's 3x3 passes in kernels/masks.py — this is the
tiled-at-scale form).

Scale shape: the exact same halo-exchange contract as stages/focal.py,
with the DEM-style band-0 slice (stages/terrain.py:dem_only) so the
exchange carries 1/bands of the corpus plus ``radius``-deep strips.
The saturation IS the scale design: an unbounded distance transform is
a global propagation (image-diameter rounds of exchange); bounding it
at ``radius`` makes it exactly computable from one ``radius``-halo
exchange — chamfer iteration propagates at most one cell per round, so
``radius`` rounds over a ``radius``-padded tile are exact for every
value <= radius, and everything farther reports the saturation value.

Exactness: integer chamfer (3x3 min + 1) on int64 — bit-identical at
any batching/partitioning; the full-image sidecar oracle replays the
same iteration with plain padding (synth.generate_distance_expected).
Border rule: pixels OUTSIDE the image are not obstacles (missing
border halos and the sidecar's pad agree by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..constants import NODATA
from .focal import make_halo_explode
from .terrain import dem_only


def _min3(a, fill):
    """One 3x3 min-filter pass (out-of-plane = fill)."""
    H, W = a.shape
    p = np.pad(a, 1, constant_values=fill)
    out = a.copy()
    for di in range(3):
        for dj in range(3):
            np.minimum(out, p[di:di + H, dj:dj + W], out=out)
    return out


def chebyshev_distance_u(obstacle, radius):
    """Saturated Chebyshev distance transform: int64 plane of
    min(radius + 1, distance to nearest True in ``obstacle``).
    Exact by induction: after k chamfer rounds every value <= k is
    final, and ``radius`` rounds finalize everything below the cap."""
    cap = np.int64(radius + 1)
    dist = np.where(obstacle, np.int64(0), cap)
    for _ in range(radius):
        dist = np.minimum(dist, _min3(dist, cap) + 1)
    return np.minimum(dist, cap)


def make_distance_assemble(radius):
    """Stage B: one band-0 tile + radius-deep halo strips ->
    (tile_id, sum_dist, n_cap, n_px)."""

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "tile_id": pd.Series([], dtype=object),
            "sum_dist": pd.Series([], dtype="int64"),
            "n_cap": pd.Series([], dtype="int64"),
            "n_px": pd.Series([], dtype="int64")}
        me = g[g["kind"] == 0]
        if not len(me):
            return pd.DataFrame(empty)
        m = me.iloc[0]
        H, W = int(m["h"]), int(m["w"])
        r = radius
        vals = np.zeros((H + 2 * r, W + 2 * r), dtype=np.int64)
        inside = np.zeros((H + 2 * r, W + 2 * r), dtype=bool)
        vals[r:r + H, r:r + W] = np.frombuffer(
            m["payload"], dtype=np.int16).reshape((1, H, W))[0]
        inside[r:r + H, r:r + W] = True
        for _, s in g[g["kind"] == 1].iterrows():
            sh, sw = int(s["h"]), int(s["w"])
            arr = np.frombuffer(s["payload"], dtype=np.int16).reshape(
                (1, sh, sw))[0]
            pr, pc = int(s["pos_r"]), int(s["pos_c"])
            rs = slice(0, r) if pr < 0 else (
                slice(r + H, 2 * r + H) if pr > 0 else slice(r, r + H))
            cs = slice(0, r) if pc < 0 else (
                slice(r + W, 2 * r + W) if pc > 0 else slice(r, r + W))
            vals[rs, cs] = arr
            inside[rs, cs] = True
        dist = chebyshev_distance_u((vals == NODATA) & inside, r)
        core = dist[r:r + H, r:r + W]
        return pd.DataFrame({
            "tile_id": [m["tile_id"]],
            "sum_dist": pd.Series([int(core.sum())], dtype="int64"),
            "n_cap": pd.Series([int((core == r + 1).sum())],
                               dtype="int64"),
            "n_px": pd.Series([H * W], dtype="int64")})

    return assemble


def distance_to_nodata_tiles(tiles, radius=4):
    """Distributed saturated distance-to-NODATA summary per tile (see
    module docstring). Returns (tile_id, sum_dist, n_cap, n_px)."""
    exploded = tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h", "w",
         "bands", "pixels"]) \
        .map_batches(dem_only, batch_format="pyarrow") \
        .map_batches(make_halo_explode(radius), batch_format="pyarrow")
    return exploded.groupby(["image_id", "key_row", "key_col"]) \
        .map_groups(make_distance_assemble(radius),
                    batch_format="pandas")

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


def binarize_band0(tiles, threshold=2500):
    """Band-0 classification to a binary (bands=1) tile set: fg = 1
    where value > threshold (NODATA → 0). Output tiles carry int16
    0/1 payloads and feed the focal/halo machinery unchanged."""

    def cls(batch: pa.Table) -> pa.Table:
        from .decode import binary_views
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bd = batch["bands"].to_numpy()
        out = []
        for i in range(batch.num_rows):
            arr = values[offsets[i]:offsets[i + 1]].reshape(
                (int(bd[i]), int(hs[i]), int(ws[i])))
            z = arr[0]
            fg = ((z != NODATA) & (z > threshold)).astype(np.int16)
            out.append(fg[None, :, :].tobytes())
        return pa.table({
            "tile_id": batch["tile_id"],
            "image_id": batch["image_id"],
            "cell": batch["cell"],
            "row_off": batch["row_off"],
            "col_off": batch["col_off"],
            "h": batch["h"], "w": batch["w"],
            "bands": pa.array([1] * batch.num_rows, pa.int32()),
            "pixels": pa.array(out, pa.binary())})

    return tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h",
         "w", "bands", "pixels"]).map_batches(
        cls, batch_format="pyarrow")


def _focal_to_pixels(focal_ds):
    """Adapter for CHAINED halo rounds: a focal-stage output (int64
    ``focal`` payload) back into an int16 ``pixels`` tile set. Loudly
    refuses values outside int16 (binary/morphology payloads are
    0/1)."""

    def conv(df: pd.DataFrame) -> pd.DataFrame:
        px = []
        for _, r in df.iterrows():
            arr = np.frombuffer(r["focal"], dtype=np.int64)
            assert (np.abs(arr) < 32768).all(), \
                "focal payload exceeds int16 range"
            px.append(arr.astype(np.int16).tobytes())
        out = df[["tile_id", "image_id", "cell", "row_off", "col_off",
                  "h", "w", "bands"]].copy()
        out["pixels"] = px
        return out

    return focal_ds.map_batches(conv, batch_format="pandas")


def morph_open_tiles(tiles, threshold=2500, summarize=True):
    """Binary morphological OPENING (3×3 erosion then 3×3 dilation) of
    the band-0 classification — the mask-cleanup operator (the
    reference's clean_mask, kernels/masks.py:35, runs scipy 3×3 passes
    on whole in-RAM rasters; this is the tiled form). The first
    CHAINED-halo pipeline in the engine: two groupby exchanges, the
    second consuming the first's output through the _focal_to_pixels
    adapter — erosion must see its 8 neighbors' ERODED values, which
    no single halo round can provide.

    Semantics: windows shrink at IMAGE borders (outside pixels are
    neither fg nor bg — erosion at a border considers only existing
    neighbors), matching the full-image sidecar replay
    (synth.generate_morph_expected). Exact 0/1 integers throughout.

    Returns per tile (image_id, row_off, col_off, n_open, open_wsum)
    where open_wsum = Σ opened · ((row_off+i)·100003 + col_off+j) pins
    every opened pixel's position."""
    from .focal import focal_stat_tiles

    binary = binarize_band0(tiles, threshold=threshold)
    eroded = focal_stat_tiles(binary, stat="min", radius=1)
    opened = focal_stat_tiles(_focal_to_pixels(eroded), stat="max",
                              radius=1)
    if not summarize:
        return opened

    def summary(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"image_id": [], "row_off": [], "col_off": [],
                "n_open": [], "open_wsum": []}
        for _, r in df.iterrows():
            H, W = int(r["h"]), int(r["w"])
            arr = np.frombuffer(r["focal"], dtype=np.int64).reshape(
                (H, W))
            ii, jj = np.nonzero(arr)
            wsum = ((ii + int(r["row_off"])) * np.int64(100003)
                    + jj + int(r["col_off"])).sum()
            rows["image_id"].append(r["image_id"])
            rows["row_off"].append(int(r["row_off"]))
            rows["col_off"].append(int(r["col_off"]))
            rows["n_open"].append(int(len(ii)))
            rows["open_wsum"].append(int(wsum))
        return pd.DataFrame(rows).astype(
            {"row_off": "int64", "col_off": "int64", "n_open": "int64",
             "open_wsum": "int64"})

    return opened.map_batches(summary, batch_format="pandas")

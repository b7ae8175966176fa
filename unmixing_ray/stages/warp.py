"""Raster warp (bilinear resample to a finer grid) via the cross-tile
halo exchange.

The missing Ray Data primitive this implements: a grid change whose
output pixels straddle input-tile borders. Output pixel centers map to
source coordinates ``src = (dst + 0.5) * den / num - 0.5`` for an
``num/den`` upsample (num > den, e.g. 5/4: 32-px tiles -> 40-px tiles);
bilinear interpolation needs the two surrounding source rows/cols, which
for the first/last output rows of a tile live in the NEIGHBORING input
tile. The scale-correct shape is the same HALO EXCHANGE as
stages/focal.py (strips ~13% of corpus bytes; never whole-image
gathers) — stage A is the shared ``make_halo_explode``; stage B
assembles the 1-px-padded tile and interpolates.

Exactness: all arithmetic is integer. With ``D = 2 * num``, the source
position of output row ``gy`` is the rational ``((2*gy+1)*den - num) /
D``; the bilinear value is the integer numerator ``V`` in units of
``1/D^2`` and the emitted pixel is ``floor(V / D^2)`` — bit-identical
regardless of batching/partitioning and hash-checkable against the
full-image sidecar oracle. Image borders use edge replication (clamp),
the standard warp border rule.

Scale notes: each output tile depends on exactly one input tile plus a
radius-1 halo (proof: for num >= den, ``src`` of the tile's first/last
output row lies within [tile_start - 1, tile_end + 1]); the stage
asserts ``num > den`` — coarsening is the reduction tree's job
(stages/pyramid.py), which moves 1/f^2 of the corpus instead of halos.

No reference analogue to copy: the reference warps whole in-RAM rasters
through GDAL; this operator exists for the tiled-at-scale regime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .focal import make_halo_explode


def _axis_maps(t_out, num, den):
    """Per-output-pixel source indices/weights along one axis, in
    LOCAL padded coordinates (0 = halo row above, 1..tile = the tile,
    tile+1 = halo row below). Returns (i0, i1, w0, w1) arrays and the
    weight denominator D."""
    D = 2 * num
    dst = np.arange(t_out, dtype=np.int64)
    src_num = (2 * dst + 1) * den - num          # src * D
    i0 = src_num // D                            # floor, in-tile units
    frac = src_num - i0 * D                      # 0..D-1
    w1 = frac
    w0 = D - frac
    return i0 + 1, i0 + 2, w0, w1, D             # padded coords


def make_warp_assemble(num=5, den=4):
    """Stage B: one tile + radius-1 halo strips -> bilinear-upsampled
    tile (int64 payload of floor-bilinear values)."""
    if num <= den:
        raise ValueError("warp stage is for upsampling (num > den); "
                         "use stages/pyramid.py to coarsen")

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        me = g[g["kind"] == 0]
        empty = {
            "tile_id": pd.Series([], dtype=object),
            "image_id": pd.Series([], dtype=object),
            "out_row_off": pd.Series([], dtype="int32"),
            "out_col_off": pd.Series([], dtype="int32"),
            "h": pd.Series([], dtype="int32"),
            "w": pd.Series([], dtype="int32"),
            "bands": pd.Series([], dtype="int32"),
            "warped": pd.Series([], dtype=object)}
        if not len(me):
            return pd.DataFrame(empty)
        m = me.iloc[0]
        p, H, W = int(m["bands"]), int(m["h"]), int(m["w"])
        if (H * num) % den or (W * num) % den:
            raise ValueError(
                f"tile {H}x{W} not upsample-compatible with {num}/{den}")
        vals = np.zeros((p, H + 2, W + 2), dtype=np.int64)
        vals[:, 1:1 + H, 1:1 + W] = np.frombuffer(
            m["payload"], dtype=np.int16).reshape((p, H, W))
        row_ok = np.zeros(H + 2, dtype=bool)
        col_ok = np.zeros(W + 2, dtype=bool)
        row_ok[1:1 + H] = True
        col_ok[1:1 + W] = True
        for _, s in g[g["kind"] == 1].iterrows():
            arr = np.frombuffer(s["payload"], dtype=np.int16).reshape(
                (int(s["bands"]), int(s["h"]), int(s["w"])))
            pr, pc = int(s["pos_r"]), int(s["pos_c"])
            rs = slice(0, 1) if pr < 0 else (
                slice(1 + H, 2 + H) if pr > 0 else slice(1, 1 + H))
            cs = slice(0, 1) if pc < 0 else (
                slice(1 + W, 2 + W) if pc > 0 else slice(1, 1 + W))
            vals[:, rs, cs] = arr
            if pr != 0:
                row_ok[rs] = True
            if pc != 0:
                col_ok[cs] = True
        t_out_h = H * num // den
        t_out_w = W * num // den
        r0, r1, wy0, wy1, D = _axis_maps(t_out_h, num, den)
        c0, c1, wx0, wx1, _ = _axis_maps(t_out_w, num, den)
        # edge replication: a padded index whose row/col never arrived
        # is outside the image -> clamp to the tile's own edge
        r0 = np.where(row_ok[r0], r0, np.clip(r0, 1, H))
        r1 = np.where(row_ok[r1], r1, np.clip(r1, 1, H))
        c0 = np.where(col_ok[c0], c0, np.clip(c0, 1, W))
        c1 = np.where(col_ok[c1], c1, np.clip(c1, 1, W))
        v00 = vals[:, r0[:, None], c0[None, :]]
        v01 = vals[:, r0[:, None], c1[None, :]]
        v10 = vals[:, r1[:, None], c0[None, :]]
        v11 = vals[:, r1[:, None], c1[None, :]]
        V = (wy0[:, None] * (wx0[None, :] * v00 + wx1[None, :] * v01)
             + wy1[:, None] * (wx0[None, :] * v10 + wx1[None, :] * v11))
        out = V // (D * D)
        return pd.DataFrame({
            "tile_id": [m["tile_id"]],
            "image_id": [m["image_id"]],
            "out_row_off": pd.Series(
                [int(m["key_row"]) * num // den], dtype="int32"),
            "out_col_off": pd.Series(
                [int(m["key_col"]) * num // den], dtype="int32"),
            "h": pd.Series([t_out_h], dtype="int32"),
            "w": pd.Series([t_out_w], dtype="int32"),
            "bands": pd.Series([p], dtype="int32"),
            "warped": [out.tobytes()]})

    return assemble


def warp_tiles(tiles, num=5, den=4):
    """Distributed bilinear upsample of tiled rasters by num/den (see
    module docstring). Returns a Dataset of output tiles whose
    ``warped`` column is the little-endian int64 (bands, h, w)
    payload."""
    exploded = tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h", "w",
         "bands", "pixels"]).map_batches(
        make_halo_explode(1), batch_format="pyarrow")
    return exploded.groupby(["image_id", "key_row", "key_col"]) \
        .map_groups(make_warp_assemble(num, den), batch_format="pandas")


def warp_band_sums(warped_tiles):
    """Per-(tile, band) sums of the warped values — the compact
    hash-checkable summary used by the oracle query."""

    def sums(batch: pa.Table) -> pa.Table:
        tile_ids, bands_out, sums_out = [], [], []
        for i in range(batch.num_rows):
            p = batch["bands"][i].as_py()
            h = batch["h"][i].as_py()
            w = batch["w"][i].as_py()
            arr = np.frombuffer(batch["warped"][i].as_py(),
                                dtype=np.int64).reshape((p, h, w))
            s = arr.sum(axis=(1, 2))
            tid = batch["tile_id"][i].as_py()
            tile_ids.extend([tid] * p)
            bands_out.extend(range(p))
            sums_out.extend(int(v) for v in s)
        return pa.table({
            "tile_id": pa.array(tile_ids, pa.string()),
            "band": pa.array(bands_out, pa.int64()),
            "warp_sum": pa.array(sums_out, pa.int64())})

    return warped_tiles.map_batches(sums, batch_format="pyarrow")

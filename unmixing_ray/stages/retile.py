"""Retiling: re-chunk the raster tile grid to a coarser granularity.

At 100 TB the tile edge is a tuning knob — FCLS batching wants small
tiles, focal/warp halo overhead wants large ones, and a downstream
consumer (e.g. a training-patch sampler) may want a different chunk
size than the ingest tiling. ``retile`` merges ``f x f`` child tiles
into one parent tile: the canonical "repartition the raster grid"
operation.

Scale shape: this IS a full repartition of the pixel payload — every
byte moves through exactly ONE ``groupby(image_id, parent_ty,
parent_tx)`` exchange (there is no cheaper shape: re-chunking is an
all-to-all by definition, like ``Dataset.repartition``). The group key
is narrow, payloads ride as opaque binary, and assembly is a
vectorized block copy per parent. Ragged edges are handled: children
smaller than the base tile (image borders) assemble into a
correspondingly smaller parent.

No reference analogue to copy: the reference operates on whole in-RAM
GDAL rasters and has no tiling at all; this operator exists for the
tiled-at-scale regime (same contract family as stages/focal.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..constants import NODATA
from .decode import binary_views


def _parse_tyx(tile_id):
    """tile ids are '<image_id>_t<ty>_<tx>' (stages/decode.py)."""
    head, tx = tile_id.rsplit("_", 1)
    img, ty = head.rsplit("_t", 1)
    return img, int(ty), int(tx)


def make_retile_key(tile, factor):
    """Stage A: annotate each child tile with its parent grid position
    (parent_ty, parent_tx) from row_off/col_off — pure arithmetic, no
    payload touched."""
    edge = tile * factor

    def keyer(batch: pa.Table) -> pa.Table:
        ro = batch["row_off"].to_numpy().astype(np.int64)
        co = batch["col_off"].to_numpy().astype(np.int64)
        return batch.append_column(
            "parent_ty", pa.array(ro // edge, pa.int64())) \
            .append_column("parent_tx", pa.array(co // edge, pa.int64()))

    return keyer


def make_retile_assemble(tile, factor):
    """Stage B: one parent group's children -> the assembled parent
    tile row. Parent dims are the bounding box of its children (ragged
    at image borders); interior gaps are structurally impossible (the
    tiler emits every child), but missing-child groups still assemble
    deterministically with NODATA fill."""
    edge = tile * factor

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "tile_id": pd.Series([], dtype=object),
            "image_id": pd.Series([], dtype=object),
            "row_off": pd.Series([], dtype="int32"),
            "col_off": pd.Series([], dtype="int32"),
            "h": pd.Series([], dtype="int32"),
            "w": pd.Series([], dtype="int32"),
            "bands": pd.Series([], dtype="int32"),
            "pixels": pd.Series([], dtype=object),
            "caption": pd.Series([], dtype=object)}
        if not len(g):
            return pd.DataFrame(empty)
        img = g["image_id"].iloc[0]
        pty = int(g["parent_ty"].iloc[0])
        ptx = int(g["parent_tx"].iloc[0])
        r0, c0 = pty * edge, ptx * edge
        bands = int(g["bands"].iloc[0])
        ph = int((g["row_off"].astype(np.int64)
                  + g["h"].astype(np.int64)).max() - r0)
        pw = int((g["col_off"].astype(np.int64)
                  + g["w"].astype(np.int64)).max() - c0)
        out = np.full((bands, ph, pw), NODATA, dtype=np.int16)
        for _, row in g.iterrows():
            ch, cw = int(row["h"]), int(row["w"])
            arr = np.frombuffer(row["pixels"], dtype=np.int16).reshape(
                (bands, ch, cw))
            rr = int(row["row_off"]) - r0
            cc = int(row["col_off"]) - c0
            out[:, rr:rr + ch, cc:cc + cw] = arr
        return pd.DataFrame({
            "tile_id": ["%s_t%d_%d" % (img, pty, ptx)],
            "image_id": [img],
            "row_off": pd.Series([r0], dtype="int32"),
            "col_off": pd.Series([c0], dtype="int32"),
            "h": pd.Series([ph], dtype="int32"),
            "w": pd.Series([pw], dtype="int32"),
            "bands": pd.Series([bands], dtype="int32"),
            "pixels": pd.Series([out.tobytes()], dtype=object),
            "caption": [g["caption"].iloc[0]
                        if "caption" in g.columns else None]})

    return assemble


def retile(tiles, tile, factor=2):
    """Merge ``factor x factor`` child tiles (base edge ``tile``) into
    parent tiles of edge ``tile * factor``. One groupby exchange moves
    the payload; everything else is per-batch arithmetic. Returns a
    Dataset with the same core tile columns at the coarser granularity.
    """
    cols = ["tile_id", "image_id", "row_off", "col_off", "h", "w",
            "bands", "pixels"]
    if "caption" in tiles.schema().names:
        cols.append("caption")
    keyed = tiles.select_columns(cols).map_batches(
        make_retile_key(tile, factor), batch_format="pyarrow")
    return keyed.groupby(["image_id", "parent_ty", "parent_tx"]) \
        .map_groups(make_retile_assemble(tile, factor),
                    batch_format="pandas")


def retile_band0_summary(parents):
    """Oracle-checkable summary of a retiled Dataset: per parent tile,
    the non-NoData band-0 sum and count (matching the zonal-stats
    sidecar semantics) — SUM-decomposable over children, so the DuckDB
    oracle regroups the per-child sidecar rows by parent key with no
    new sidecar."""

    def summarize(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        bands = batch["bands"].to_numpy()
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        sums, ns = [], []
        for i in range(batch.num_rows):
            npx = int(hs[i]) * int(ws[i])
            b0 = values[offsets[i]:offsets[i] + npx].astype(np.int64)
            valid = b0 != NODATA
            sums.append(int(b0[valid].sum()))
            ns.append(int(valid.sum()))
        ids = batch["tile_id"].to_pylist()
        parsed = [_parse_tyx(t) for t in ids]
        return pa.table({
            "image_id": pa.array([p[0] for p in parsed], pa.string()),
            "parent_ty": pa.array([p[1] for p in parsed], pa.int64()),
            "parent_tx": pa.array([p[2] for p in parsed], pa.int64()),
            "b0_sum": pa.array(sums, pa.int64()),
            "b0_n": pa.array(ns, pa.int64()),
        })

    return parents.map_batches(summarize, batch_format="pyarrow")

"""Decode + tile stages: images table → tiles table.

Reference analogue: ``as_array`` (utils.py:45-63) opens a whole raster in
driver RAM; here decode happens inside ``map_batches`` over zero-copy Arrow
batches and immediately re-emits fixed-size tiles, each carrying its own
resolved geotransform (utils.py:118-150's xoff/yoff become row_off/col_off
baked into the tile gt) and the H3/S2-style cell id of its centroid.

The two stages are fused into one batch function so full-image pixel
payloads never hit the object store — only tile rows do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import cellindex, geo
from ..codecs import decode_image
from ..constants import DEFAULT_CELL_LEVEL, DEFAULT_TILE

TILES_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("image_id", pa.string()),
    ("cell", pa.uint64()),
    ("row_off", pa.int32()),
    ("col_off", pa.int32()),
    ("h", pa.int32()),
    ("w", pa.int32()),
    ("bands", pa.int32()),
    # pixel payloads are BINARY blobs (little-endian int16 / uint8,
    # band-major): parquet binary decode is a memcpy, whereas list<int16>
    # pages cost ~9 s CPU per read pass at sf0.1 — serialization discipline
    # matters as much as kernel speed at scale
    ("pixels", pa.binary()),
    ("qa", pa.binary()),
    ("gt", pa.list_(pa.float64(), 6)),
    ("crs", pa.string()),
    ("caption", pa.string()),
    ("cx", pa.float64()),
    ("cy", pa.float64()),
])


def binary_column(chunks):
    """Build a pa.binary() column from a list of numpy arrays (bytes are
    the raw little-endian buffer of each array)."""
    return pa.array([c.tobytes() for c in chunks], pa.binary())


def binary_views(col, dtype):
    """(values, offsets) numpy views over a pa.binary()/list column's
    buffers, with values cast to ``dtype`` and offsets in elements."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        off_buf, data_buf = col.buffers()[1], col.buffers()[2]
        off_dtype = np.int64 if pa.types.is_large_binary(col.type) \
            else np.int32
        offsets = np.frombuffer(off_buf, dtype=off_dtype)[
            col.offset:col.offset + len(col) + 1]
        itemsize = np.dtype(dtype).itemsize
        values = np.frombuffer(data_buf, dtype=dtype)
        return values, (offsets // itemsize).astype(np.int64)
    # list<...> fallback (stages/tests that build rows with python
    # lists) — keeps the list's native dtype
    values = col.values.to_numpy(zero_copy_only=False)
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return values, offsets


def decode_batch(batch: pa.Table) -> pa.Table:
    """Decode the ``bytes`` column to a ``pixels`` binary column.

    Kept separate from tiling for the per-row decode invariant tests
    (PSNR >= 40 dB / exact for lossless + caption equality).
    """
    fmts = batch["fmt"].to_pylist()
    ws = batch["w"].to_pylist()
    hs = batch["h"].to_pylist()
    bufs = batch["bytes"].to_pylist()
    arrays = [decode_image(bufs[i], fmts[i], ws[i], hs[i])
              for i in range(batch.num_rows)]
    pixels = binary_column(arrays)
    bands = pa.array([a.shape[0] for a in arrays], pa.int32())
    out = batch.drop_columns(["bytes"])
    out = out.append_column("pixels", pixels)
    return out.append_column("bands", bands)


def make_decode_and_tile(tile=DEFAULT_TILE, cell_level=DEFAULT_CELL_LEVEL,
                         keep_qa=True):
    """Factory for the fused decode→tile batch function.

    Each input image row becomes ceil(h/tile)*ceil(w/tile) tile rows; the
    cell id is the quadtree cell containing the tile centroid (bit-exact
    tile assignment is part of the north-star contract).
    """

    def decode_and_tile(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        bufs = batch["bytes"].to_pylist()
        gts = batch["gt"].to_pylist()
        crss = batch["crs"].to_pylist()
        caps = batch["caption"].to_pylist()
        ids = batch["image_id"].to_pylist()
        qas = batch["qa"].to_pylist() if (
            keep_qa and "qa" in batch.column_names) else [None] * n

        cols = {k: [] for k in (
            "tile_id", "image_id", "row_off", "col_off", "h", "w",
            "bands", "crs", "caption", "cx", "cy")}
        gt_rows = []
        px_chunks = []
        qa_chunks = []
        for i in range(n):
            arr = decode_image(bufs[i], fmts[i], ws[i], hs[i])
            p, ih, iw = arr.shape
            qa_arr = None
            if qas[i] is not None:
                qa_arr = np.frombuffer(qas[i], dtype=np.uint8)\
                    .reshape((ih, iw))
            gt = tuple(gts[i])
            n_ty = (ih + tile - 1) // tile
            n_tx = (iw + tile - 1) // tile
            aligned = (ih % tile == 0) and (iw % tile == 0)
            if aligned:
                # vectorized split: (p, ty, T, tx, T) -> (ty*tx, p, T, T)
                blocks = arr.reshape(p, n_ty, tile, n_tx, tile)\
                    .transpose(1, 3, 0, 2, 4)\
                    .reshape(n_ty * n_tx, p, tile, tile)
                qa_blocks = None
                if qa_arr is not None:
                    qa_blocks = qa_arr.reshape(n_ty, tile, n_tx, tile)\
                        .transpose(0, 2, 1, 3)\
                        .reshape(n_ty * n_tx, tile, tile)
            t_i = 0
            for ty in range(n_ty):
                for tx in range(n_tx):
                    r0, c0 = ty * tile, tx * tile
                    r1, c1 = min(r0 + tile, ih), min(c0 + tile, iw)
                    tgt = geo.tile_geotransform(gt, c0, r0)
                    th, tw = r1 - r0, c1 - c0
                    cx = tgt[0] + (tw / 2.0) * tgt[1]
                    cy = tgt[3] + (th / 2.0) * tgt[5]
                    cols["tile_id"].append("%s_t%d_%d" % (ids[i], ty, tx))
                    cols["image_id"].append(ids[i])
                    cols["row_off"].append(r0)
                    cols["col_off"].append(c0)
                    cols["h"].append(th)
                    cols["w"].append(tw)
                    cols["bands"].append(p)
                    cols["crs"].append(crss[i])
                    cols["caption"].append(caps[i])
                    cols["cx"].append(cx)
                    cols["cy"].append(cy)
                    gt_rows.append(list(tgt))
                    if aligned:
                        px_chunks.append(blocks[t_i].ravel())
                        if qa_arr is not None:
                            qa_chunks.append(qa_blocks[t_i].ravel())
                    else:
                        px_chunks.append(np.ascontiguousarray(
                            arr[:, r0:r1, c0:c1]).ravel())
                        if qa_arr is not None:
                            qa_chunks.append(np.ascontiguousarray(
                                qa_arr[r0:r1, c0:c1]).ravel())
                    t_i += 1
        cells = cellindex.cell_of_xy(
            np.array(cols["cx"]), np.array(cols["cy"]), cell_level)

        data = {
            "tile_id": pa.array(cols["tile_id"], pa.string()),
            "image_id": pa.array(cols["image_id"], pa.string()),
            "cell": pa.array(cells, pa.uint64()),
            "row_off": pa.array(cols["row_off"], pa.int32()),
            "col_off": pa.array(cols["col_off"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "w": pa.array(cols["w"], pa.int32()),
            "bands": pa.array(cols["bands"], pa.int32()),
            "pixels": binary_column(px_chunks),
            "qa": binary_column(qa_chunks)
                  if qa_chunks else pa.nulls(len(cols["tile_id"]),
                                             pa.binary()),
            "gt": pa.array(gt_rows, pa.list_(pa.float64(), 6)),
            "crs": pa.array(cols["crs"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "cx": pa.array(cols["cx"], pa.float64()),
            "cy": pa.array(cols["cy"], pa.float64()),
        }
        return pa.table(data, schema=TILES_SCHEMA)

    return decode_and_tile


def tiles_to_ndarray(batch: pa.Table):
    """Zero-copy-ish view of a tile batch's pixels as numpy.

    Returns (list_of_arrays, uniform) where uniform is a single
    (n, bands, h, w) ndarray when every tile has the same shape (the fast
    path), else None and per-tile arrays must be used.
    """
    values, offsets = binary_views(batch["pixels"], np.int16)
    bands = batch["bands"].to_numpy()
    hs = batch["h"].to_numpy()
    ws = batch["w"].to_numpy()
    n = batch.num_rows
    if n and (bands == bands[0]).all() and (hs == hs[0]).all() \
            and (ws == ws[0]).all():
        uniform = values[offsets[0]:offsets[-1]].reshape(
            (n, int(bands[0]), int(hs[0]), int(ws[0])))
        return None, uniform
    arrays = [
        values[offsets[i]:offsets[i + 1]].reshape(
            (int(bands[i]), int(hs[i]), int(ws[i])))
        for i in range(n)
    ]
    return arrays, None


def as_pixels(value, bands, h, w, dtype=np.int16):
    """One row's pixel payload (bytes | list) → (bands, h, w) ndarray."""
    if isinstance(value, (bytes, bytearray, memoryview)):
        return np.frombuffer(value, dtype=dtype).reshape(
            (int(bands), int(h), int(w)))
    return np.asarray(value).reshape((int(bands), int(h), int(w)))

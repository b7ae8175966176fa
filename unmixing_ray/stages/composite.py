"""Multi-date composite + global-mode QA stages (the explicit shuffles).

- ``composite_by_cell``: ``groupby(cell)`` over (cell, date) tile rows →
  per-group composite3 kernel (reference utils.py:343-525 semantics). The
  group key is the spatial cell so all dates of a pixel meet in one group;
  salting here must use spatial sub-blocks, NOT row hashing (a pixel's
  dates must stay together), so hot-cell handling splits tiles into
  quadrant sub-tiles before the shuffle when requested.
- ``mask_ledaps_qa_two_pass``: global QA value counts (small shuffle on
  qa value) → driver mode → broadcast apply (reference utils.py:796-845).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..constants import NODATA
from ..kernels import composite as ck
from ..kernels import masks as mk
from .decode import tiles_to_ndarray


def composite_by_cell(tiles, reducers, normalize="sum", nodata=NODATA,
                      dtype=np.float32, hot_threshold=None, sub=4):
    """tiles: Dataset with (cell, date, h, w, bands, pixels) — one row per
    (cell, date). Returns one composited tile row per cell.

    ``hot_threshold``: when set, skew handling is automatic (VERDICT r02
    item 9 — callers previously had to compose it by hand): a cheap
    key-column count pre-pass finds cells with more than
    ``hot_threshold`` rows, their tiles are split into ``sub``x``sub``
    spatial sub-tiles BEFORE the shuffle (all dates of a pixel stay
    together), the composite groups on (cell, sub_id), and a tiny
    second groupby reassembles each hot cell's sub-tiles — output rows
    are identical to the unsalted plan's. Note the pre-pass executes the
    input pipeline once more; pass a checkpointed/cheap Dataset.

    ``hot_threshold="auto"`` (VERDICT r04 item 6) switches to the
    cost-model decision: the input is MATERIALIZED once (so the count
    pre-pass rides the cached blocks instead of re-executing the
    upstream pipeline — the overhead that made force-salting lose at
    quiet windows), and salting engages only for cells whose row count
    exceeds ``alpha`` balanced worker shares
    (:func:`~.shuffle.should_salt`) — below that the hot group hides
    behind the scan and the split/reassembly taxes cannot pay."""

    def comp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("date")
        from .decode import as_pixels
        arrays = []
        for px, b, h, w in zip(g["pixels"], g["bands"], g["h"], g["w"]):
            if isinstance(px, (bytes, bytearray)):
                arrays.append(as_pixels(px, b, h, w,
                                        np.int16).astype(np.float64))
            else:
                arrays.append(np.asarray(px, dtype=np.float64).reshape(
                    (int(b), int(h), int(w))))
        out = ck.composite3(reducers, *arrays, normalize=normalize,
                            nodata=nodata, dtype=dtype)
        row = {
            "cell": [g["cell"].iloc[0]],
            "bands": [out.shape[0]],
            "h": [out.shape[1]], "w": [out.shape[2]],
            "n_dates": [len(arrays)],
            "pixels": [out.astype(np.float32).ravel().tolist()],
        }
        if "sub_id" in g.columns:
            row["sub_id"] = [int(g["sub_id"].iloc[0])]
        return pd.DataFrame(row)

    if hot_threshold is None:
        return tiles.groupby("cell").map_groups(comp,
                                                batch_format="pandas")
    from .shuffle import cell_counts, hot_key_audit, should_salt
    if hot_threshold == "auto":
        import ray
        tiles = tiles.materialize()
        hot_counts, tot_rows = hot_key_audit(tiles, "cell")
        hot = should_salt(hot_counts,
                          n_cpus=int(ray.cluster_resources()
                                     .get("CPU", 8)), sub=sub,
                          total_rows=tot_rows)
    else:
        counts = cell_counts(tiles, "cell")
        hot = [c for c, n in counts.items() if n > hot_threshold]
    if not hot:
        return tiles.groupby("cell").map_groups(comp,
                                                batch_format="pandas")
    split = split_hot_tiles(tiles, hot, sub=sub)
    parts = split.groupby(["cell", "sub_id"]).map_groups(
        comp, batch_format="pandas")

    def merge_cell(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 1 and int(g["sub_id"].iloc[0]) == 0:
            return g.drop(columns=["sub_id"])
        g = g.sort_values("sub_id")
        blocks = {}
        for _, r in g.iterrows():
            sid = int(r["sub_id"]) - 1
            arr = np.asarray(r["pixels"], dtype=np.float32).reshape(
                (int(r["bands"]), int(r["h"]), int(r["w"])))
            blocks[(sid // sub, sid % sub)] = arr
        heights = [blocks[(sy, 0)].shape[1]
                   for sy in range(sub) if (sy, 0) in blocks]
        widths = [blocks[(0, sx)].shape[2]
                  for sx in range(sub) if (0, sx) in blocks]
        H, W = sum(heights), sum(widths)
        bands = int(g["bands"].iloc[0])
        out = np.empty((bands, H, W), dtype=np.float32)
        y0 = 0
        for sy, hh in enumerate(heights):
            x0 = 0
            for sx, ww in enumerate(widths):
                out[:, y0:y0 + hh, x0:x0 + ww] = blocks[(sy, sx)]
                x0 += ww
            y0 += hh
        return pd.DataFrame({
            "cell": [g["cell"].iloc[0]],
            "bands": [bands], "h": [H], "w": [W],
            "n_dates": [int(g["n_dates"].iloc[0])],
            "pixels": [out.ravel().tolist()],
        })

    return parts.groupby("cell").map_groups(merge_cell,
                                            batch_format="pandas")


def qa_mode_global(tiles, qa_col="qa"):
    """Pass 1 of mask_ledaps_qa: distributed QA value counts → global
    modal value (reference computes np.bincount on the whole raster,
    utils.py:835)."""

    def counts(batch: pa.Table) -> pa.Table:
        col = batch[qa_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        values = col.values.to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(values, return_counts=True)
        return pa.table({
            "qa_value": pa.array(vals.astype(np.int64)),
            "n": pa.array(cnts.astype(np.int64)),
        })

    from ray.data.aggregate import Sum
    agg = tiles.map_batches(counts, batch_format="pyarrow")\
        .groupby("qa_value").aggregate(Sum("n", alias_name="n"))\
        .to_pandas()
    # top-1 by count, lowest value on tie (bincount-argmax analogue)
    agg = agg.sort_values(["n", "qa_value"],
                          ascending=[False, True])
    return int(agg.iloc[0]["qa_value"])


def make_ledaps_apply(mode, nodata=NODATA):
    """Pass 2: broadcast modal value, mask every tile."""

    def apply(batch: pa.Table) -> pa.Table:
        arrays, uniform = tiles_to_ndarray(batch)
        qa_col = batch["qa"]
        if isinstance(qa_col, pa.ChunkedArray):
            qa_col = qa_col.combine_chunks()
        n = batch.num_rows
        outs = []
        for i in range(n):
            a = uniform[i] if uniform is not None else arrays[i]
            h, w = a.shape[1], a.shape[2]
            qa = np.asarray(qa_col[i].as_py(), dtype=np.int64)\
                .reshape(h, w)
            outs.append(mk.mask_ledaps_qa_apply(a, qa, mode, nodata)
                        .astype(np.int16).ravel())
        values = np.concatenate(outs) if outs else np.empty(0, np.int16)
        offsets = np.zeros(n + 1, dtype=np.int64)
        if outs:
            offsets[1:] = np.cumsum([o.size for o in outs])
        col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int64()).cast(pa.int32()),
            pa.array(values, pa.int16()))
        i = batch.column_names.index("pixels")
        return batch.set_column(i, "pixels", col)

    return apply


def split_hot_tiles(tiles, hot_cells, sub=2):
    """Skew handling for composites: split tiles of hot cells into
    ``sub``×``sub`` spatial sub-tiles (key becomes (cell, sub_id)), which
    preserves all-dates-per-pixel grouping while dividing group size.
    Payloads stay BINARY through the shuffle (list<int16> pages cost ~9 s
    CPU per pass at sf0.1 — the round-1 serialization lesson)."""
    hot = set(int(c) for c in hot_cells)

    def split(batch: pa.Table) -> pa.Table:
        arrays, uniform = tiles_to_ndarray(batch)
        out = {k: [] for k in ("cell", "sub_id", "date", "bands", "h",
                               "w")}
        chunks = []
        for i in range(batch.num_rows):
            a = uniform[i] if uniform is not None else arrays[i]
            cell = batch["cell"][i].as_py()
            date = batch["date"][i].as_py() if "date" in \
                batch.column_names else 0
            if int(cell) not in hot:
                out["cell"].append(cell)
                out["sub_id"].append(0)
                out["date"].append(date)
                out["bands"].append(a.shape[0])
                out["h"].append(a.shape[1])
                out["w"].append(a.shape[2])
                chunks.append(np.ascontiguousarray(a).ravel())
                continue
            hh = a.shape[1] // sub
            ww = a.shape[2] // sub
            for sy in range(sub):
                for sx in range(sub):
                    # the last sub-block absorbs the remainder rows/cols
                    # so no pixel is dropped when h or w is not divisible
                    # by sub (salted output must equal the unsalted plan)
                    y1 = a.shape[1] if sy == sub - 1 else (sy + 1) * hh
                    x1 = a.shape[2] if sx == sub - 1 else (sx + 1) * ww
                    part = a[:, sy * hh:y1, sx * ww:x1]
                    if part.size == 0:
                        continue
                    out["cell"].append(cell)
                    out["sub_id"].append(sy * sub + sx + 1)
                    out["date"].append(date)
                    out["bands"].append(part.shape[0])
                    out["h"].append(part.shape[1])
                    out["w"].append(part.shape[2])
                    chunks.append(np.ascontiguousarray(part).ravel())
        from .decode import binary_column
        tbl = {k: pa.array(v) for k, v in out.items()}
        tbl["pixels"] = binary_column(chunks)
        return pa.table(tbl)

    return tiles.map_batches(split, batch_format="pyarrow")

"""Hough-transform line detection over tiled rasters — parameter-space
VOTING as a distributed plan.

The classic Hough transform quantizes (theta, rho) with float trig; the
exact-at-any-partitioning variant here restricts theta to the four
RATIONAL directions (dx, dy) ∈ {(1,0), (0,1), (1,1), (1,-1)} so the
signed offset

    rho = dy·x − dx·y        (x, y = within-image pixel coordinates)

is an exact integer: every masked pixel votes for one (dir, rho) line
per direction, and a maximal line is a global accumulator argmax. This
is the voting/accumulator operator family (the register.py
cross-correlation is its dense sibling) — nothing in Ray Data expresses
it directly; the plan is:

1. per-batch combiner: each tile bincounts its masked pixels'
   (image_id, dir, rho) votes locally (np.unique — never a row per
   pixel leaves the task);
2. ONE ``groupby(image_id, dir, rho)`` Sum merges partial votes —
   REQUIRED before the argmax because a line crosses tile boundaries,
   so no single tile sees its full count;
3. a second tiny ``groupby(image_id, dir)`` Max over the packed key
   ``votes·2^15 + (2^14 − rho)`` picks each image's strongest line per
   direction (max votes, then SMALLEST rho — the pack order makes the
   tiebreak associative).

Exchange volume is bounded by distinct (image, dir, rho) keys —
O(images · dirs · (H+W)) — never pixel rows. Mask = band-0 NODATA, so
on the synthetic corpus the detector must recover the planted NODATA
strips (sources/synth.py:_plant, seq % 7) whose expected maxima are
CLOSED-FORM from the plant spec (synth.generate_hough_expected) — the
motion-clip discipline: the oracle never runs the detector.

Reference analogue: none (the reference has no parameter-space op);
engine-new, exists for the tiled-at-scale regime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Max, Sum

from ..constants import NODATA
from .decode import binary_views

# (dx, dy) per direction index; rho = dy*x - dx*y
DIRS = ((1, 0), (0, 1), (1, 1), (1, -1))
_RHO_BIAS = 1 << 14
_PACK = 1 << 15


def hough_lines(tiles, band=0):
    """Strongest line per (image, direction) over the band-``band``
    NODATA mask (see module docstring). Returns (image_id, dir,
    best_rho, votes); images with no masked pixel emit nothing."""

    def votes_partial(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bd = batch["bands"].to_numpy()
        row_off = batch["row_off"].to_numpy()
        col_off = batch["col_off"].to_numpy()
        imgs = batch["image_id"].to_pylist()
        out_img, out_dir, out_rho, out_n = [], [], [], []
        for i in range(batch.num_rows):
            arr = values[offsets[i]:offsets[i + 1]].reshape(
                (int(bd[i]), int(hs[i]), int(ws[i])))
            ii, jj = np.nonzero(arr[band] == NODATA)
            if not len(ii):
                continue
            y = ii.astype(np.int64) + int(row_off[i])
            x = jj.astype(np.int64) + int(col_off[i])
            for d, (dx, dy) in enumerate(DIRS):
                rho = dy * x - dx * y
                u, c = np.unique(rho, return_counts=True)
                out_img.extend([imgs[i]] * len(u))
                out_dir.extend([d] * len(u))
                out_rho.extend(u.tolist())
                out_n.extend(c.tolist())
        return pa.table({
            "image_id": pa.array(out_img, pa.string()),
            "dir": pa.array(out_dir, pa.int64()),
            "rho": pa.array(out_rho, pa.int64()),
            "n": pa.array(out_n, pa.int64())})

    acc = tiles.select_columns(
        ["image_id", "row_off", "col_off", "pixels", "bands", "h",
         "w"]) \
        .map_batches(votes_partial, batch_format="pyarrow") \
        .groupby(["image_id", "dir", "rho"]) \
        .aggregate(Sum("n", alias_name="votes"))

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        rho = df["rho"].to_numpy(np.int64)
        v = df["votes"].to_numpy(np.int64)
        assert (np.abs(rho) < _RHO_BIAS).all(), "rho exceeds pack range"
        return pd.DataFrame({
            "image_id": df["image_id"],
            "dir": df["dir"].astype("int64"),
            "packed": v * _PACK + (_RHO_BIAS - rho)})

    best = acc.map_batches(pack, batch_format="pandas") \
        .groupby(["image_id", "dir"]) \
        .aggregate(Max("packed", alias_name="packed"))

    def unpack(df: pd.DataFrame) -> pd.DataFrame:
        p = df["packed"].to_numpy(np.int64)
        return pd.DataFrame({
            "image_id": df["image_id"],
            "dir": df["dir"].astype("int64"),
            "best_rho": _RHO_BIAS - (p % _PACK),
            "votes": p // _PACK}).astype(
            {"best_rho": "int64", "votes": "int64"})

    return best.map_batches(unpack, batch_format="pandas")

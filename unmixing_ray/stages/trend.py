"""Temporal trend composite: per-position linear regression over a
multi-date tile stack.

The time-series analogue of the reference's composite family
(utils.py:343-525 reduces a date stack pixel-wise with
median/min/max/mean): here the reducer is the least-squares SLOPE of
pixel value vs acquisition index — the classic Landsat change-detection
workload (NDVI greening/browning trend mapping) that a
median-composite engine cannot express. y is the tile's BAND-0 pixel
sum (the index band, matching stages/terrain.py:dem_only's convention),
which keeps num = n·Σty − Σt·Σy inside int64 for stacks up to ~20k
dates of 32-px tiles; `finish` raises loudly (never wraps) beyond that
— the documented deep-stack path is centering t per key (pass-0 min-t)
plus two-word accumulation.

Scale shape — this is the showcase ASSOCIATIVE-PARTIALS reduce: the
regression statistics (n, Σt, Σt², Σy, Σty) are all sums, so each
batch pre-aggregates its tiles into ONE 5-int partial row per
(cell, row_off, col_off) position and the groupby exchange never
carries a pixel payload (the skewed corpus stacks ~n_hot dates on one
position — the exchange is n_batches·5 ints per hot key instead of
n_hot tile payloads, so the hot key needs no salting at any stack
depth). Final slope is returned as EXACT int64 numerator/denominator
(num = n·Σty − Σt·Σy, den = n·Σt² − (Σt)², y = the tile's band-0 pixel
sum), bit-identical at any batching.

The date index t is the image sequence number parsed from the engine's
image_id convention ("img%08d"), i.e. a value each task derives
locally — no global rank pass.

Key discipline: the group key is (cell_ix, cell_iy, row_off, col_off)
with the Morton cell id decoded to small int64 lattice coordinates
INSIDE the partials stage — raw uint64 cell ids carry level bits above
2^53 and are not float-safe when PANDAS-format partial blocks feed a
groupby().aggregate() (the stages/label.py lesson; observed: 2404 keys
collapsed to 2202 grouping on the raw cell column here, while
stages/rollup.py aggregates the same uint64 keys safely from
Arrow-format partials).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

from .. import cellindex
from .decode import binary_views


def _partials(batch: pa.Table) -> pd.DataFrame:
    values, offsets = binary_views(batch["pixels"], np.int16)
    hs = batch["h"].to_numpy()
    ws = batch["w"].to_numpy()
    cells = batch["cell"].to_numpy(zero_copy_only=False)
    cix, ciy, _lv = cellindex.cell_to_ixiy(cells.astype(np.uint64))
    ro = batch["row_off"].to_numpy()
    co = batch["col_off"].to_numpy()
    ids = batch["image_id"].to_pylist()
    acc = {}
    for i in range(batch.num_rows):
        t = int(ids[i][3:])           # engine image_id = "img%08d"
        hw = int(hs[i]) * int(ws[i])
        b0 = values[offsets[i]:offsets[i] + hw]   # band 0 of (p,h,w)
        y = int(b0.astype(np.int64).sum())
        k = (int(cix[i]), int(ciy[i]), int(ro[i]), int(co[i]))
        a = acc.get(k)
        if a is None:
            acc[k] = [1, t, t * t, y, t * y]
        else:
            a[0] += 1
            a[1] += t
            a[2] += t * t
            a[3] += y
            a[4] += t * y
    keys = list(acc.keys())
    cols = np.array([acc[k] for k in keys], dtype=np.int64).reshape(
        (len(keys), 5))
    return pd.DataFrame({
        "cell_ix": pd.Series([k[0] for k in keys], dtype="int64"),
        "cell_iy": pd.Series([k[1] for k in keys], dtype="int64"),
        "row_off": pd.Series([k[2] for k in keys], dtype="int64"),
        "col_off": pd.Series([k[3] for k in keys], dtype="int64"),
        "n": cols[:, 0], "st": cols[:, 1], "st2": cols[:, 2],
        "sy": cols[:, 3], "sty": cols[:, 4]})


def temporal_trend(tiles):
    """Distributed per-position regression over a date-stacked tile
    table; returns (cell_ix, cell_iy, row_off, col_off, n_dates,
    trend_num, trend_den) with exact int64 rational slope = num/den (den = 0 for
    single-date positions)."""
    agg = tiles.select_columns(
        ["image_id", "cell", "row_off", "col_off", "h", "w",
         "pixels"]) \
        .map_batches(_partials, batch_format="pyarrow") \
        .groupby(["cell_ix", "cell_iy", "row_off", "col_off"]) \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("st", alias_name="st"),
                   Sum("st2", alias_name="st2"),
                   Sum("sy", alias_name="sy"),
                   Sum("sty", alias_name="sty"))

    # pyarrow in/out: a pandas hop would round the uint64 Morton cell
    # ids through float64 and collapse distinct cells (the label.py
    # lesson — ids > 2^53 are not float-safe)
    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy().astype(np.int64)
        st = batch["st"].to_numpy().astype(np.int64)
        st2 = batch["st2"].to_numpy().astype(np.int64)
        sy = batch["sy"].to_numpy().astype(np.int64)
        sty = batch["sty"].to_numpy().astype(np.int64)
        # exact-domain guard: refuse to wrap (see module docstring)
        f = np.float64
        if len(n) and (
                (np.abs(n.astype(f) * sty.astype(f)) > 2 ** 62).any()
                or (np.abs(st.astype(f) * sy.astype(f))
                    > 2 ** 62).any()):
            raise OverflowError(
                "temporal_trend: stack too deep for int64 rational "
                "slope; center t (pass-0 min per key) for this corpus")
        return pa.table({
            "cell_ix": batch["cell_ix"].cast(pa.int64()),
            "cell_iy": batch["cell_iy"].cast(pa.int64()),
            "row_off": batch["row_off"].cast(pa.int64()),
            "col_off": batch["col_off"].cast(pa.int64()),
            "n_dates": pa.array(n, pa.int64()),
            "trend_num": pa.array(n * sty - st * sy, pa.int64()),
            "trend_den": pa.array(n * st2 - st * st, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def _latest_partials(valid_max):
    def partials(batch: pa.Table) -> pd.DataFrame:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        cix, ciy, _lv = cellindex.cell_to_ixiy(cells.astype(np.uint64))
        ro = batch["row_off"].to_numpy()
        co = batch["col_off"].to_numpy()
        ids = batch["image_id"].to_pylist()
        acc = {}
        for i in range(batch.num_rows):
            t = int(ids[i][3:])
            h, w = int(hs[i]), int(ws[i])
            b0 = values[offsets[i]:offsets[i] + h * w] \
                .reshape((h, w)).astype(np.int64)
            valid = b0 <= valid_max
            tt = np.where(valid, np.int64(t), np.int64(-1))
            vv = np.where(valid, b0, np.int64(0))
            k = (int(cix[i]), int(ciy[i]), int(ro[i]), int(co[i]))
            a = acc.get(k)
            if a is None:
                acc[k] = [tt, vv]
            else:
                newer = tt > a[0]
                a[0] = np.where(newer, tt, a[0])
                a[1] = np.where(newer, vv, a[1])
        keys = list(acc.keys())
        return pd.DataFrame({
            "cell_ix": pd.Series([k[0] for k in keys], dtype="int64"),
            "cell_iy": pd.Series([k[1] for k in keys], dtype="int64"),
            "row_off": pd.Series([k[2] for k in keys], dtype="int64"),
            "col_off": pd.Series([k[3] for k in keys], dtype="int64"),
            "t_plane": [acc[k][0].tobytes() for k in keys],
            "v_plane": [acc[k][1].tobytes() for k in keys],
            "h": pd.Series([int(hs[0])] * len(keys), dtype="int64"),
            "w": pd.Series([int(ws[0])] * len(keys), dtype="int64")})

    return partials


def _latest_merge(g: pd.DataFrame) -> pd.DataFrame:
    h, w = int(g["h"].iloc[0]), int(g["w"].iloc[0])
    bt = np.full((h, w), np.int64(-1))
    bv = np.zeros((h, w), np.int64)
    for _, row in g.iterrows():
        tt = np.frombuffer(row["t_plane"], np.int64).reshape((h, w))
        vv = np.frombuffer(row["v_plane"], np.int64).reshape((h, w))
        newer = tt > bt
        bt = np.where(newer, tt, bt)
        bv = np.where(newer, vv, bv)
    return pd.DataFrame({
        "cell_ix": pd.Series([int(g["cell_ix"].iloc[0])], dtype="int64"),
        "cell_iy": pd.Series([int(g["cell_iy"].iloc[0])], dtype="int64"),
        "row_off": pd.Series([int(g["row_off"].iloc[0])], dtype="int64"),
        "col_off": pd.Series([int(g["col_off"].iloc[0])], dtype="int64"),
        "latest_sum": pd.Series([int(bv.sum())], dtype="int64"),
        "latest_t_sum": pd.Series([int(bt.sum())], dtype="int64"),
        "n_hole": pd.Series([int((bt < 0).sum())], dtype="int64")})


def composite_latest(tiles, valid_max=2600):
    """Last-valid-observation composite — the most-used Landsat
    compositing rule (take each pixel's most RECENT cloud-free value),
    which median/mean composites cannot express because it is an
    ARGMAX-BY-DATE reduce carrying a payload: per pixel, keep the value
    of the latest date whose band-0 observation passes the validity
    gate (``b0 <= valid_max`` stands in for a cloud mask; NODATA-free
    corpora get a planted invalid class this way).

    Scale shape: the argmax pair (best_t, best_value) is associative,
    so each batch pre-merges its tiles into ONE (t, v) plane pair per
    position — the exchange carries at most 2 int64 planes per
    (batch, key), NOT the n_hot-deep stack — and a groupby merges the
    pairs; bit-identical at any batching. Pixels never observed valid
    report t = -1 / v = 0 (counted as n_hole). Summaries
    (latest_sum, latest_t_sum, n_hole) pin every selected pixel via
    the sidecar hash (synth.generate_latest_expected)."""
    parts = tiles.select_columns(
        ["image_id", "cell", "row_off", "col_off", "h", "w",
         "pixels"]) \
        .map_batches(_latest_partials(valid_max),
                     batch_format="pyarrow")
    return parts.groupby(["cell_ix", "cell_iy", "row_off", "col_off"]) \
        .map_groups(_latest_merge, batch_format="pandas")


def _change_partials(t_split):
    def partials(batch: pa.Table) -> pd.DataFrame:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        cix, ciy, _lv = cellindex.cell_to_ixiy(cells.astype(np.uint64))
        ro = batch["row_off"].to_numpy()
        co = batch["col_off"].to_numpy()
        ids = batch["image_id"].to_pylist()
        acc = {}
        for i in range(batch.num_rows):
            t = int(ids[i][3:])
            hw = int(hs[i]) * int(ws[i])
            y = int(values[offsets[i]:offsets[i] + hw]
                    .astype(np.int64).sum())
            late = 1 if t >= t_split else 0
            k = (int(cix[i]), int(ciy[i]), int(ro[i]), int(co[i]))
            a = acc.get(k)
            if a is None:
                acc[k] = [1 - late, late, 0 if late else y,
                          y if late else 0]
            else:
                a[0] += 1 - late
                a[1] += late
                a[2] += 0 if late else y
                a[3] += y if late else 0
        keys = list(acc.keys())
        cols = np.array([acc[k] for k in keys], dtype=np.int64).reshape(
            (len(keys), 4))
        return pd.DataFrame({
            "cell_ix": pd.Series([k[0] for k in keys], dtype="int64"),
            "cell_iy": pd.Series([k[1] for k in keys], dtype="int64"),
            "row_off": pd.Series([k[2] for k in keys], dtype="int64"),
            "col_off": pd.Series([k[3] for k in keys], dtype="int64"),
            "n_early": cols[:, 0], "n_late": cols[:, 1],
            "sum_early": cols[:, 2], "sum_late": cols[:, 3]})

    return partials


def epoch_change(tiles, t_split):
    """Bi-temporal change detection: per tile position, the exact
    rational difference of mean band-0 tile sum between the late epoch
    (acquisition index >= ``t_split``) and the early epoch — the
    two-date composite-delta workload (deforestation / urbanization
    mapping between two Landsat epochs). delta = sum_late/n_late −
    sum_early/n_early returned as EXACT int64 numerator
    (sum_late·n_early − sum_early·n_late) and denominator
    (n_late·n_early, 0 when a position has observations in only one
    epoch).

    Scale shape: same associative-partials reduce as temporal_trend —
    each batch pre-aggregates to one 4-int row per (batch, position),
    so the planted hot stack crosses the exchange as O(n_batches) rows
    regardless of stack depth; bit-identical at any batching.

    Reference parity: the reference composites each epoch separately
    (utils.py composite family) and differences rasters driver-side;
    here both epochs ride ONE pass and one groupby.
    """
    agg = tiles.select_columns(
        ["image_id", "cell", "row_off", "col_off", "h", "w",
         "pixels"]) \
        .map_batches(_change_partials(t_split), batch_format="pyarrow") \
        .groupby(["cell_ix", "cell_iy", "row_off", "col_off"]) \
        .aggregate(Sum("n_early", alias_name="n_early"),
                   Sum("n_late", alias_name="n_late"),
                   Sum("sum_early", alias_name="sum_early"),
                   Sum("sum_late", alias_name="sum_late"))

    # pyarrow in/out (the label.py float-safety lesson; see temporal_trend)
    def finish(batch: pa.Table) -> pa.Table:
        ne = batch["n_early"].to_numpy().astype(np.int64)
        nl = batch["n_late"].to_numpy().astype(np.int64)
        se = batch["sum_early"].to_numpy().astype(np.int64)
        sl = batch["sum_late"].to_numpy().astype(np.int64)
        f = np.float64
        if len(ne) and ((np.abs(sl.astype(f) * ne.astype(f)) > 2 ** 62)
                        .any() or
                        (np.abs(se.astype(f) * nl.astype(f)) > 2 ** 62)
                        .any()):
            raise OverflowError(
                "epoch_change: stack too deep for int64 rational delta")
        return pa.table({
            "cell_ix": batch["cell_ix"].cast(pa.int64()),
            "cell_iy": batch["cell_iy"].cast(pa.int64()),
            "row_off": batch["row_off"].cast(pa.int64()),
            "col_off": batch["col_off"].cast(pa.int64()),
            "n_early": pa.array(ne, pa.int64()),
            "n_late": pa.array(nl, pa.int64()),
            "delta_num": pa.array(sl * ne - se * nl, pa.int64()),
            "delta_den": pa.array(nl * ne, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def _cube_partials(n_bins, t_count):
    nb = int(n_bins)
    tc = int(t_count)

    def partials(batch: pa.Table) -> pd.DataFrame:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        cix, ciy, _lv = cellindex.cell_to_ixiy(cells.astype(np.uint64))
        ro = batch["row_off"].to_numpy()
        co = batch["col_off"].to_numpy()
        ids = batch["image_id"].to_pylist()
        acc = {}
        for i in range(batch.num_rows):
            t = int(ids[i][3:])
            b = t * nb // tc
            hw = int(hs[i]) * int(ws[i])
            y = int(values[offsets[i]:offsets[i] + hw]
                    .astype(np.int64).sum())
            k = (int(cix[i]), int(ciy[i]), int(ro[i]), int(co[i]), b)
            a = acc.get(k)
            if a is None:
                acc[k] = [1, y]
            else:
                a[0] += 1
                a[1] += y
        keys = list(acc.keys())
        cols = np.array([acc[k] for k in keys], dtype=np.int64).reshape(
            (len(keys), 2))
        return pd.DataFrame({
            "cell_ix": pd.Series([k[0] for k in keys], dtype="int64"),
            "cell_iy": pd.Series([k[1] for k in keys], dtype="int64"),
            "row_off": pd.Series([k[2] for k in keys], dtype="int64"),
            "col_off": pd.Series([k[3] for k in keys], dtype="int64"),
            "bin": pd.Series([k[4] for k in keys], dtype="int64"),
            "n_obs": cols[:, 0], "sum_b0": cols[:, 1]})

    return partials


def composite_cube(tiles, n_bins, t_count, fill=True):
    """Gap-filled time-series composite cube: per tile position and
    time bin (``bin = t * n_bins // t_count`` over acquisition index
    t), the observation count and exact band-0 tile sum — the standard
    monthly/seasonal Landsat composite product, with optional forward
    gap fill: a bin with no observations carries the newest earlier
    bin's composite (``fill_bin`` = source bin, -1 when nothing
    earlier exists). Mean = fill_sum / fill_n exact rational.

    Output: one row per (position, bin) for EVERY bin 0..n_bins-1 of
    every observed position (empty bins are materialized rows — that's
    the product contract: a dense cube).

    Scale shape: same associative-partials reduce as temporal_trend
    (one 2-int row per (batch, position, bin) through the exchange —
    the planted hot stack never ships payloads), then ONE
    groupby(position) pass over the n_bins-row groups does the dense
    expansion and forward fill (n_bins is a constant; the group is
    never large). Bit-identical at any batching/partitioning.
    """
    nb = int(n_bins)
    agg = tiles.select_columns(
        ["image_id", "cell", "row_off", "col_off", "h", "w",
         "pixels"]) \
        .map_batches(_cube_partials(nb, t_count),
                     batch_format="pyarrow") \
        .groupby(["cell_ix", "cell_iy", "row_off", "col_off", "bin"]) \
        .aggregate(Sum("n_obs", alias_name="n_obs"),
                   Sum("sum_b0", alias_name="sum_b0"))

    def densify(g: pd.DataFrame) -> pd.DataFrame:
        n = np.zeros(nb, np.int64)
        s = np.zeros(nb, np.int64)
        bins = g["bin"].to_numpy(np.int64)
        n[bins] = g["n_obs"].to_numpy(np.int64)
        s[bins] = g["sum_b0"].to_numpy(np.int64)
        fb = np.full(nb, -1, np.int64)
        fn = np.zeros(nb, np.int64)
        fs = np.zeros(nb, np.int64)
        last = -1
        for b in range(nb):
            if n[b] > 0:
                last = b
            fb[b] = last
            if last >= 0:
                fn[b] = n[last]
                fs[b] = s[last]
        if not fill:
            fb = np.where(n > 0, np.arange(nb, dtype=np.int64), -1)
            fn, fs = n.copy(), s.copy()
        return pd.DataFrame({
            "cell_ix": np.full(nb, int(g["cell_ix"].iloc[0]), np.int64),
            "cell_iy": np.full(nb, int(g["cell_iy"].iloc[0]), np.int64),
            "row_off": np.full(nb, int(g["row_off"].iloc[0]), np.int64),
            "col_off": np.full(nb, int(g["col_off"].iloc[0]), np.int64),
            "bin": np.arange(nb, dtype=np.int64),
            "n_obs": n, "sum_b0": s,
            "fill_bin": fb, "fill_n": fn, "fill_sum": fs})

    return agg.groupby(["cell_ix", "cell_iy", "row_off", "col_off"]) \
        .map_groups(densify, batch_format="pandas")


# ---------------------------------------------------------------------------
# per-pixel percentile composite (order statistic over the date stack)

SUBT = 8            # static spatial sub-split edge, px
_SENTINEL = np.int64(1) << 40   # sorts above any valid int16 value


def _pct_partials(nodata):
    def partials(batch: pa.Table) -> pd.DataFrame:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bands = batch["bands"].to_numpy()
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        cix, ciy, _lv = cellindex.cell_to_ixiy(cells.astype(np.uint64))
        ro = batch["row_off"].to_numpy()
        co = batch["col_off"].to_numpy()
        out = {"cell_ix": [], "cell_iy": [], "row_off": [],
               "col_off": [], "px": []}
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            npx = h * w
            b0 = values[offsets[i]:offsets[i] + npx].reshape(h, w)
            for sy in range(0, h, SUBT):
                for sx in range(0, w, SUBT):
                    blk = b0[sy:sy + SUBT, sx:sx + SUBT]
                    out["cell_ix"].append(int(cix[i]))
                    out["cell_iy"].append(int(ciy[i]))
                    out["row_off"].append(int(ro[i]) + sy)
                    out["col_off"].append(int(co[i]) + sx)
                    out["px"].append(
                        np.ascontiguousarray(blk).tobytes())
        df = pd.DataFrame({
            "cell_ix": pd.Series(out["cell_ix"], dtype="int64"),
            "cell_iy": pd.Series(out["cell_iy"], dtype="int64"),
            "row_off": pd.Series(out["row_off"], dtype="int64"),
            "col_off": pd.Series(out["col_off"], dtype="int64"),
            "px": out["px"]})
        return df

    return partials


def _pct_merge(q_num, q_den, nodata):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack([np.frombuffer(b, dtype=np.int16)
                          for b in g["px"]]).astype(np.int64)
        valid = stack != nodata
        m = valid.sum(axis=0)
        work = np.where(valid, stack, _SENTINEL)
        work.sort(axis=0)
        idx = np.where(m > 0, (m - 1) * q_num // q_den, 0)
        got = np.take_along_axis(work, idx[None, :], axis=0)[0]
        got = np.where(m > 0, got, np.int64(0))
        return pd.DataFrame({
            "cell_ix": g["cell_ix"].iloc[:1].reset_index(drop=True),
            "cell_iy": g["cell_iy"].iloc[:1].reset_index(drop=True),
            "row_off": g["row_off"].iloc[:1].reset_index(drop=True),
            "col_off": g["col_off"].iloc[:1].reset_index(drop=True),
            "n_dates": pd.Series([len(g)], dtype="int64"),
            "q_sum": pd.Series([int(got.sum())], dtype="int64"),
            "n_hole": pd.Series([int((m == 0).sum())], dtype="int64")})

    return merge


def composite_percentile(tiles, q_num=1, q_den=4, nodata=-9999):
    """Per-pixel PERCENTILE composite over the date stack — the
    quartile/best-available-pixel compositing rule (e.g. a 25th-
    percentile composite approximates a cloud-shadow-robust dark
    baseline) that mean/argmax composites cannot express: an order
    statistic needs every date's value per pixel, so unlike
    :func:`temporal_trend` / :func:`composite_latest` it CANNOT be
    reduced associatively — the honest scale shape is a full
    co-location of each pixel's stack.

    Skew design: tiles are statically re-chunked to ``SUBT``×``SUBT``
    sub-blocks in the stateless partial pass, so the planted hot
    position's group divides by (TILE/SUBT)² = 16 WITHOUT a counting
    pre-pass (finer spatial granularity is the salting — all dates of
    a pixel stay together, the per-group payload is n_dates·64·2 B).
    Per pixel: value = sorted-valid[(m−1)·q_num // q_den], NODATA
    excluded, never-valid pixels report 0 and count in n_hole.
    Returns per-position int64 summaries (n_dates, q_sum, n_hole) —
    hash-checkable against the full-stack replay sidecar
    (synth.generate_percentile_expected)."""
    parts = tiles.select_columns(
        ["cell", "row_off", "col_off", "h", "w", "bands", "pixels"]) \
        .map_batches(_pct_partials(nodata), batch_format="pyarrow")
    return parts.groupby(["cell_ix", "cell_iy", "row_off", "col_off"]) \
        .map_groups(_pct_merge(q_num, q_den, nodata),
                    batch_format="pandas")

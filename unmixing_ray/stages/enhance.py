"""Global raster enhancement: corpus-wide histogram equalization.

The classic two-pass GLOBAL-STATISTICS raster transform (same family as
the reference's BCI/RNDSI global min-max normalization,
transform.py:46-77/220-262, and mask_ledaps_qa's global mode,
utils.py:796-845): pass 1 reduces the whole corpus to a tiny model —
one per-band histogram — and pass 2 re-maps every pixel through the
broadcast model.

Scale shape: pass 1 is combiner-before-shuffle (each batch emits only
its NONZERO (band, bin, n) partial rows, never per-pixel rows; the
groupby merges ≤ bands·bins rows per batch) and the driver collect is
exactly bands·bins rows regardless of corpus size. The equalization
LUT (bands·bins int64 entries) rides the map_batches closure into
pass 2 — a broadcast, never a join.

At 100 TB the two passes should not both re-decode the corpus: fit the
histogram from the tiles CHECKPOINT (or piggyback the partials on the
checkpoint write, the MNF-stats side-channel pattern in
pipelines/flagship.py) and run only the remap pass over raw input.

Exactness: integer histogram counts, integer CDF, floor-division LUT
(``eq[b] = (cdf[b] - cdf_min) * (levels-1) // (N - cdf_min)``) — the
output is bit-identical at any batching/partitioning, and the
full-corpus sidecar oracle (synth.generate_equalize_expected) replays
the same definition in one single-machine pass, so a match proves the
distributed two-pass plumbing. NODATA pixels are excluded from the
histogram and pass through unmapped (not counted in n_valid).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum

from ..constants import NODATA
from .decode import binary_views


def _bin_of(vals, lo, hi, bins):
    """Integer bin index for values clipped to [lo, hi]."""
    v = np.clip(vals, lo, hi).astype(np.int64)
    return (v - lo) * bins // (hi - lo + 1)


def fit_equalize_lut(tiles, bins=256, lo=0, hi=10000, levels=256):
    """Pass 1: per-band global histogram → equalization LUT
    (bands, bins) int64. Driver memory = bands·bins rows."""

    def hist_partial(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bd = batch["bands"].to_numpy()
        out_band, out_bin, out_n = [], [], []
        for i in range(batch.num_rows):
            arr = values[offsets[i]:offsets[i + 1]].reshape(
                (int(bd[i]), int(hs[i]), int(ws[i])))
            for b in range(arr.shape[0]):
                row = arr[b].ravel()
                valid = row != NODATA
                if not valid.any():
                    continue
                h = np.bincount(_bin_of(row[valid], lo, hi, bins),
                                minlength=bins)
                nz = np.flatnonzero(h)
                out_band.extend([b] * len(nz))
                out_bin.extend(int(x) for x in nz)
                out_n.extend(int(h[x]) for x in nz)
        return pa.table({
            "band": pa.array(out_band, pa.int64()),
            "bin": pa.array(out_bin, pa.int64()),
            "n": pa.array(out_n, pa.int64())})

    rows = tiles.select_columns(["pixels", "bands", "h", "w"]) \
        .map_batches(hist_partial, batch_format="pyarrow") \
        .groupby(["band", "bin"]) \
        .aggregate(Sum("n", alias_name="n_total")).take_all()
    n_bands = 1 + max(int(r["band"]) for r in rows)
    hist = np.zeros((n_bands, bins), dtype=np.int64)
    for r in rows:
        hist[int(r["band"]), int(r["bin"])] = int(r["n_total"])
    return build_lut(hist, levels)


def build_lut(hist, levels=256):
    """Histogram (bands, bins) → equalization LUT, the standard
    cdf-min form with exact integer floor division."""
    n_bands, bins = hist.shape
    lut = np.zeros((n_bands, bins), dtype=np.int64)
    for b in range(n_bands):
        cdf = np.cumsum(hist[b])
        total = int(cdf[-1])
        nz = np.flatnonzero(hist[b])
        if not len(nz):
            continue
        cdf_min = int(cdf[nz[0]])
        denom = total - cdf_min
        if denom <= 0:
            continue   # single occupied bin: everything maps to 0
        lut[b] = (cdf - cdf_min) * (levels - 1) // denom
        lut[b, :nz[0]] = 0
    return lut


def equalize_tiles(tiles, bins=256, lo=0, hi=10000, levels=256):
    """Two-pass global histogram equalization; returns per-(tile, band)
    summaries (eq_sum, n_valid) of the remapped corpus."""
    lut = fit_equalize_lut(tiles, bins=bins, lo=lo, hi=hi,
                           levels=levels)

    def apply(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bd = batch["bands"].to_numpy()
        tids = batch["tile_id"].to_pylist()
        out = {"tile_id": [], "band": [], "eq_sum": [], "n_valid": []}
        for i in range(batch.num_rows):
            arr = values[offsets[i]:offsets[i + 1]].reshape(
                (int(bd[i]), int(hs[i]), int(ws[i])))
            for b in range(arr.shape[0]):
                row = arr[b].ravel()
                valid = row != NODATA
                eq = lut[b][_bin_of(row[valid], lo, hi, bins)]
                out["tile_id"].append(tids[i])
                out["band"].append(b)
                out["eq_sum"].append(int(eq.sum()))
                out["n_valid"].append(int(valid.sum()))
        return pa.table({
            "tile_id": pa.array(out["tile_id"], pa.string()),
            "band": pa.array(out["band"], pa.int64()),
            "eq_sum": pa.array(out["eq_sum"], pa.int64()),
            "n_valid": pa.array(out["n_valid"], pa.int64())})

    return tiles.select_columns(["tile_id", "pixels", "bands", "h",
                                 "w"]) \
        .map_batches(apply, batch_format="pyarrow")


def fit_global_hist(tiles, bins=256, lo=0, hi=10000):
    """Pass 1 of histogram matching: the corpus-global per-band
    histogram (same combiner-before-shuffle partials as equalization;
    driver memory = bands·bins)."""

    def hist_partial(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bd = batch["bands"].to_numpy()
        out_band, out_bin, out_n = [], [], []
        for i in range(batch.num_rows):
            arr = values[offsets[i]:offsets[i + 1]].reshape(
                (int(bd[i]), int(hs[i]), int(ws[i])))
            for b in range(arr.shape[0]):
                row = arr[b].ravel()
                valid = row != NODATA
                if not valid.any():
                    continue
                h = np.bincount(_bin_of(row[valid], lo, hi, bins),
                                minlength=bins)
                nz = np.flatnonzero(h)
                out_band.extend([b] * len(nz))
                out_bin.extend(int(x) for x in nz)
                out_n.extend(int(h[x]) for x in nz)
        return pa.table({
            "band": pa.array(out_band, pa.int64()),
            "bin": pa.array(out_bin, pa.int64()),
            "n": pa.array(out_n, pa.int64())})

    rows = tiles.select_columns(["pixels", "bands", "h", "w"]) \
        .map_batches(hist_partial, batch_format="pyarrow") \
        .groupby(["band", "bin"]) \
        .aggregate(Sum("n", alias_name="n_total")).take_all()
    n_bands = 1 + max(int(r["band"]) for r in rows)
    hist = np.zeros((n_bands, bins), dtype=np.int64)
    for r in rows:
        hist[int(r["band"]), int(r["bin"])] = int(r["n_total"])
    return hist


def match_histogram_tiles(tiles, bins=256, lo=0, hi=10000):
    """Per-image histogram MATCHING to the corpus-global distribution —
    the radiometric-normalization family of the reference's
    `hall_rectification` (lsma.py:523-584, per-image linear gain from
    control sets) upgraded to full CDF matching: every image's per-band
    value distribution is remapped so its CDF tracks the global CDF.

    Plan: pass 1 = the tiny global histogram; pass 2 = ONE
    ``groupby(image_id)`` shuffle (the reference's own working extent,
    as in SASMA) — each group holds all of one image's tiles, builds
    the image histogram locally, and maps each pixel's inclusive
    image-CDF rank to the global CDF by exact integer
    cross-multiplication:

        matched_bin(v) = min { j : cdf_g[b][j]·n_img ≥ c_img(v)·N_b }

    (a searchsorted over ``cdf_g[b]·n_img`` — no float ranks, so the
    single-machine sidecar replay is bit-identical). int64 envelope:
    N_b·n_img must stay below 2^63 — at larger corpora scale the global
    CDF down by a common factor first (floor division on both sides of
    the inequality preserves the argmin).

    Returns per-(tile, band) ``match_sum`` (Σ matched bin over valid
    pixels) and ``n_valid``.
    """
    ghist = fit_global_hist(tiles, bins=bins, lo=lo, hi=hi)
    gcdf = np.cumsum(ghist, axis=1)          # (bands, bins)
    n_g = gcdf[:, -1].copy()                 # valid px per band

    def per_image(group: pa.Table) -> pa.Table:
        values, offsets = binary_views(group["pixels"], np.int16)
        hs = group["h"].to_numpy()
        ws = group["w"].to_numpy()
        bd = group["bands"].to_numpy()
        tids = group["tile_id"].to_pylist()
        n_bands = int(bd[0]) if len(bd) else 0
        # image histogram per band over ALL the group's tiles
        ihist = np.zeros((n_bands, bins), dtype=np.int64)
        arrs = []
        for i in range(group.num_rows):
            arr = values[offsets[i]:offsets[i + 1]].reshape(
                (int(bd[i]), int(hs[i]), int(ws[i])))
            arrs.append(arr)
            for b in range(arr.shape[0]):
                row = arr[b].ravel()
                row = row[row != NODATA]
                if len(row):
                    ihist[b] += np.bincount(
                        _bin_of(row, lo, hi, bins), minlength=bins)
        icdf = np.cumsum(ihist, axis=1)
        out = {"tile_id": [], "band": [], "match_sum": [],
               "n_valid": []}
        for i, arr in enumerate(arrs):
            for b in range(arr.shape[0]):
                row = arr[b].ravel()
                valid = row != NODATA
                n_img = int(icdf[b, -1])
                if n_img and valid.any():
                    cv = icdf[b][_bin_of(row[valid], lo, hi, bins)]
                    j = np.searchsorted(gcdf[b] * n_img,
                                        cv * int(n_g[b]), side="left")
                    ms = int(j.sum())
                else:
                    ms = 0
                out["tile_id"].append(tids[i])
                out["band"].append(b)
                out["match_sum"].append(ms)
                out["n_valid"].append(int(valid.sum()))
        return pa.table({
            "tile_id": pa.array(out["tile_id"], pa.string()),
            "band": pa.array(out["band"], pa.int64()),
            "match_sum": pa.array(out["match_sum"], pa.int64()),
            "n_valid": pa.array(out["n_valid"], pa.int64())})

    lean = tiles.select_columns(["tile_id", "image_id", "pixels",
                                 "bands", "h", "w"])
    return lean.groupby("image_id").map_groups(per_image,
                                               batch_format="pyarrow")


def _otsu_fixed_point(hist):
    """Exact fixed-point Otsu threshold over an integer histogram.

    Maximizes the between-class-variance surrogate

        score(t) = floor((s0·N − S·c0)² / (c0·(N − c0)))

    (c0/s0 = count/index-sum at ≤ t; N/S = totals) with the smallest-t
    tiebreak. The floor-division score IS the definition — Python ints
    here, HUGEINT in the SQL replay, identical by construction. Returns
    (t, score)."""
    h = [int(x) for x in hist]
    N = sum(h)
    S = sum(i * x for i, x in enumerate(h))
    best_t, best_score = None, -1
    c0 = s0 = 0
    for t in range(len(h) - 1):
        c0 += h[t]
        s0 += t * h[t]
        if c0 == 0 or c0 == N:
            continue
        score = (s0 * N - S * c0) ** 2 // (c0 * (N - c0))
        if score > best_score:
            best_t, best_score = t, score
    return best_t, best_score


def otsu_binarize(tiles, band=0, bins=256, lo=0, hi=10000):
    """Corpus-global Otsu thresholding + per-image binarization counts —
    the classic global auto-threshold (Otsu 1979) as a two-pass
    streaming plan: pass 1 is the tiny combiner-before-shuffle global
    histogram (fit_global_hist, ≤ bins driver rows at any corpus
    size), the driver picks the threshold with EXACT integer
    arithmetic (_otsu_fixed_point — no float variance enters the
    decision), and pass 2 broadcasts the scalar into a per-image count
    combiner + ONE groupby(image_id).

    Foreground = valid pixels whose histogram bin EXCEEDS the
    threshold bin (NODATA excluded everywhere). Returns per image
    (image_id, thr, n_fg, n_bg, fg_sum) where fg_sum = Σ bin index
    over foreground pixels — all exact int64, hash-checkable against
    the per-image-histogram sidecar replay."""
    import pandas as pd

    ghist = fit_global_hist(tiles, bins=bins, lo=lo, hi=hi)[band]
    thr, _score = _otsu_fixed_point(ghist)
    t = np.int64(thr)

    def partial(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bd = batch["bands"].to_numpy()
        imgs = batch["image_id"].to_pylist()
        agg = {}
        for i in range(batch.num_rows):
            arr = values[offsets[i]:offsets[i + 1]].reshape(
                (int(bd[i]), int(hs[i]), int(ws[i])))
            row = arr[band].ravel()
            row = row[row != NODATA]
            b = _bin_of(row, lo, hi, bins)
            fg = b > t
            cur = agg.setdefault(imgs[i], [0, 0, 0])
            cur[0] += int(fg.sum())
            cur[1] += int(len(b) - fg.sum())
            cur[2] += int(b[fg].sum())
        return pa.table({
            "image_id": pa.array(list(agg), pa.string()),
            "n_fg": pa.array([v[0] for v in agg.values()], pa.int64()),
            "n_bg": pa.array([v[1] for v in agg.values()], pa.int64()),
            "fg_sum": pa.array([v[2] for v in agg.values()],
                               pa.int64())})

    out = tiles.select_columns(["image_id", "pixels", "bands", "h",
                                "w"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("image_id").aggregate(
            Sum("n_fg", alias_name="n_fg"),
            Sum("n_bg", alias_name="n_bg"),
            Sum("fg_sum", alias_name="fg_sum"))

    def finalize(df):
        df = df.copy()
        df["thr"] = np.int64(thr)
        return df[["image_id", "thr", "n_fg", "n_bg", "fg_sum"]] \
            .astype({"thr": "int64", "n_fg": "int64", "n_bg": "int64",
                     "fg_sum": "int64"})

    return out.map_batches(finalize, batch_format="pandas")


def otsu_binarize_sql(hist_parquet):
    """Replay from the per-image-histogram sidecar: global hist by
    GROUP BY bin, the fixed-point score in HUGEINT, argmax with the
    smallest-t tiebreak, then per-image counts against the scalar.
    Candidate thresholds are the nonzero bins — equivalent to the
    engine's full 0..bins−2 sweep because an empty bin's running sums
    (hence score) equal the previous nonzero bin's, which the
    smallest-t tiebreak already prefers."""
    return f"""
        WITH ih AS (SELECT image_id, bin, n
                    FROM read_parquet('{hist_parquet}')),
        h AS (SELECT bin, sum(n) AS n FROM ih GROUP BY bin),
        tot AS (SELECT sum(n) AS nn, sum(bin * n) AS ss FROM h),
        c AS (SELECT bin,
                     sum(n) OVER (ORDER BY bin) AS c0,
                     sum(bin * n) OVER (ORDER BY bin) AS s0
              FROM h),
        sc AS (SELECT bin AS t,
                      (CAST(s0 * nn - ss * c0 AS HUGEINT)
                       * CAST(s0 * nn - ss * c0 AS HUGEINT))
                      // CAST(c0 * (nn - c0) AS HUGEINT) AS score
               FROM c, tot WHERE c0 > 0 AND c0 < nn),
        th AS (SELECT t FROM sc ORDER BY score DESC, t ASC LIMIT 1)
        SELECT image_id,
               CAST((SELECT t FROM th) AS BIGINT) AS thr,
               CAST(sum(CASE WHEN bin > (SELECT t FROM th)
                             THEN n ELSE 0 END) AS BIGINT) AS n_fg,
               CAST(sum(CASE WHEN bin <= (SELECT t FROM th)
                             THEN n ELSE 0 END) AS BIGINT) AS n_bg,
               CAST(sum(CASE WHEN bin > (SELECT t FROM th)
                             THEN bin * n ELSE 0 END) AS BIGINT)
                 AS fg_sum
        FROM ih GROUP BY image_id"""

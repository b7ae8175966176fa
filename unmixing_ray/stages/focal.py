"""Focal (neighborhood) raster operators with cross-tile halo exchange.

The classic distributed-raster primitive Ray Data lacks: a focal
(moving-window) statistic needs ``radius`` pixels of context from the
up-to-8 neighboring tiles of the same image. The scale-correct shape is
a HALO EXCHANGE, not a per-image gather:

- stage A (``map_batches``): every tile emits itself PLUS up to 8 edge
  strips (``radius`` pixels deep) addressed to its lattice neighbors —
  the strips are ~``4·radius·T/T²`` of the tile's bytes (~13% for
  radius=1 on 32-px tiles), so the exchange moves ~1.13× the corpus,
  never ``n_tiles × tile`` replication and never a whole image in one
  task;
- stage B (``groupby(image_id, row_off, col_off).map_groups``): each
  group holds exactly one tile and its received halos; assemble a
  padded array and run an exact integer box filter (integral images).

Partitioning assumptions (documented per the engine contract):
- tiles of one image form a uniform lattice (every tile the same h×w,
  offsets multiples of the tile size) — guaranteed by the engine's own
  tiler (stages/decode.py:make_decode_and_tile) for aligned images;
  stage A asserts it loudly;
- strips addressed to nonexistent border neighbors form groups with no
  self tile and are dropped in stage B (a bounded ~edge-fraction waste,
  cheaper than a pre-pass computing image extents);
- group key is the tile itself → parallelism = n_tiles, no skew.

Edge semantics: the window is the (2r+1)² Chebyshev square intersected
with the IMAGE (shrinks at image borders — counts come from a validity
integral image). Output values are ``floor(window_sum · scale /
window_count)`` in int64 (floor division, exact integer math), so
results are bit-identical regardless of batching/partitioning and
hash-checkable against an independently computed oracle.

Reference analogue: the reference operates on whole in-RAM rasters and
delegates windowed ops to scipy (e.g. the 110-px IDW windows in
sasma.py); there is no reference focal kernel to copy — this operator
exists for the tiled-at-scale regime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .decode import binary_views

# direction of the SENDER relative to the RECEIVER, stored on each strip
# so the receiver can place it without re-deriving lattice geometry
_DIRS = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
         if (dr, dc) != (0, 0)]


def make_halo_explode(radius=1):
    """Stage A: tile batch → self rows + neighbor-addressed halo strips."""

    def halo_explode(batch: pa.Table) -> pd.DataFrame:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bands = batch["bands"].to_numpy()
        row_off = batch["row_off"].to_numpy()
        col_off = batch["col_off"].to_numpy()
        image_id = batch["image_id"].to_pylist()
        tile_id = batch["tile_id"].to_pylist()
        cell = batch["cell"].to_numpy(zero_copy_only=False)

        out = {k: [] for k in (
            "image_id", "key_row", "key_col", "kind", "pos_r", "pos_c",
            "h", "w", "bands", "payload", "tile_id", "cell")}

        def emit(img, kr, kc, kind, pr, pc, arr, tid, cl):
            out["image_id"].append(img)
            out["key_row"].append(int(kr))
            out["key_col"].append(int(kc))
            out["kind"].append(kind)
            out["pos_r"].append(pr)
            out["pos_c"].append(pc)
            out["h"].append(arr.shape[1])
            out["w"].append(arr.shape[2])
            out["bands"].append(arr.shape[0])
            out["payload"].append(arr.tobytes())
            out["tile_id"].append(tid)
            out["cell"].append(cl)

        r = radius
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            if h != w or (row_off[i] % h) or (col_off[i] % w):
                raise ValueError(
                    "focal halo exchange requires a uniform tile "
                    f"lattice; got h={h} w={w} at offsets "
                    f"({row_off[i]},{col_off[i]})")
            arr = values[offsets[i]:offsets[i + 1]].reshape(
                (int(bands[i]), h, w))
            emit(image_id[i], row_off[i], col_off[i], 0, 0, 0, arr,
                 tile_id[i], int(cell[i]))
            for dr, dc in _DIRS:
                kr = int(row_off[i]) + dr * h
                kc = int(col_off[i]) + dc * w
                if kr < 0 or kc < 0:
                    continue   # provably outside the image
                rs = slice(0, r) if dr < 0 else (
                    slice(h - r, h) if dr > 0 else slice(0, h))
                cs = slice(0, r) if dc < 0 else (
                    slice(w - r, w) if dc > 0 else slice(0, w))
                # sender sits at -d relative to that neighbor
                emit(image_id[i], kr, kc, 1, -dr, -dc,
                     np.ascontiguousarray(arr[:, rs, cs]), "", 0)

        df = pd.DataFrame(out)
        return df.astype({
            "key_row": "int32", "key_col": "int32", "kind": "int8",
            "pos_r": "int8", "pos_c": "int8", "h": "int32", "w": "int32",
            "bands": "int32", "cell": "uint64"})

    return halo_explode


def _box_filter_u(vals, valid, r, scale):
    """Exact integer box filter via integral images.

    vals: (bands, H+2r, W+2r) int64 (invalid cells zero);
    valid: (H+2r, W+2r) int64 0/1. Returns (bands, H, W) int64 of
    floor(window_sum * scale / window_count) over the valid window.
    """
    p, hp, wp = vals.shape
    H, W = hp - 2 * r, wp - 2 * r
    ii = np.pad(vals, ((0, 0), (1, 0), (1, 0))).cumsum(
        axis=1).cumsum(axis=2)
    ic = np.pad(valid, ((1, 0), (1, 0))).cumsum(axis=0).cumsum(axis=1)
    k = 2 * r + 1
    s = (ii[:, k:, k:] - ii[:, :-k, k:] - ii[:, k:, :-k]
         + ii[:, :-k, :-k])
    c = (ic[k:, k:] - ic[:-k, k:] - ic[k:, :-k] + ic[:-k, :-k])
    assert s.shape[1:] == (H, W) and (c > 0).all()
    return (s * np.int64(scale)) // c[None, :, :]


def _box_var_u(vals, valid, r, scale):
    """floor(population variance · scale) over the valid window —
    exact integers: (c·Σx² − (Σx)²) · scale // c²."""
    ii = np.pad(vals, ((0, 0), (1, 0), (1, 0))).cumsum(
        axis=1).cumsum(axis=2)
    ii2 = np.pad(vals * vals, ((0, 0), (1, 0), (1, 0))).cumsum(
        axis=1).cumsum(axis=2)
    ic = np.pad(valid, ((1, 0), (1, 0))).cumsum(axis=0).cumsum(axis=1)
    k = 2 * r + 1

    def win(I):
        return I[..., k:, k:] - I[..., :-k, k:] - I[..., k:, :-k] \
            + I[..., :-k, :-k]

    s, s2, c = win(ii), win(ii2), win(ic)
    assert (c > 0).all()
    return ((c * s2 - s * s) * np.int64(scale)) // (c * c)


def _box_extreme(vals, valid, r, take_max):
    """Focal max/min via (2r+1)² vectorized shifts over the valid mask."""
    p, hp, wp = vals.shape
    H, W = hp - 2 * r, wp - 2 * r
    sentinel = np.int64(np.iinfo(np.int64).min if take_max
                        else np.iinfo(np.int64).max)
    masked = np.where(valid[None, :, :] > 0, vals, sentinel)
    out = np.full((p, H, W), sentinel, dtype=np.int64)
    op = np.maximum if take_max else np.minimum
    for di in range(2 * r + 1):
        for dj in range(2 * r + 1):
            op(out, masked[:, di:di + H, dj:dj + W], out=out)
    return out


def make_focal_assemble(radius=1, scale=1000, stat="mean"):
    """Stage B: one tile + its halo strips → focal-stat tile.

    ``stat``: "mean" (floor(Σ·scale/c)), "var" (floor(popvar·scale)),
    "max", "min", "majority" (focal mode, smallest-value tiebreak),
    "median" (exact lower median) — all exact int64,
    batching/partitioning-invariant.
    """
    if stat not in ("mean", "var", "max", "min", "majority",
                    "median"):
        raise ValueError(f"unknown focal stat {stat!r}")

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        me = g[g["kind"] == 0]
        if not len(me):
            # strips addressed beyond the image border — no such tile
            return pd.DataFrame({
                "tile_id": pd.Series([], dtype=object),
                "image_id": pd.Series([], dtype=object),
                "cell": pd.Series([], dtype="uint64"),
                "row_off": pd.Series([], dtype="int32"),
                "col_off": pd.Series([], dtype="int32"),
                "h": pd.Series([], dtype="int32"),
                "w": pd.Series([], dtype="int32"),
                "bands": pd.Series([], dtype="int32"),
                "focal": pd.Series([], dtype=object)})
        m = me.iloc[0]
        p, H, W = int(m["bands"]), int(m["h"]), int(m["w"])
        r = radius
        vals = np.zeros((p, H + 2 * r, W + 2 * r), dtype=np.int64)
        valid = np.zeros((H + 2 * r, W + 2 * r), dtype=np.int64)
        self_arr = np.frombuffer(m["payload"], dtype=np.int16).reshape(
            (p, H, W))
        vals[:, r:r + H, r:r + W] = self_arr
        valid[r:r + H, r:r + W] = 1
        for _, s in g[g["kind"] == 1].iterrows():
            sh, sw = int(s["h"]), int(s["w"])
            arr = np.frombuffer(s["payload"], dtype=np.int16).reshape(
                (int(s["bands"]), sh, sw))
            pr, pc = int(s["pos_r"]), int(s["pos_c"])
            rs = slice(0, r) if pr < 0 else (
                slice(r + H, r + H + r) if pr > 0 else slice(r, r + H))
            cs = slice(0, r) if pc < 0 else (
                slice(r + W, r + W + r) if pc > 0 else slice(r, r + W))
            vals[:, rs, cs] = arr
            valid[rs, cs] = 1
        if stat == "mean":
            focal = _box_filter_u(vals, valid, r, scale)
        elif stat == "var":
            focal = _box_var_u(vals, valid, r, scale)
        elif stat == "majority":
            focal = _box_mode(vals, valid, r)
        elif stat == "median":
            focal = _box_median(vals, valid, r)
        else:
            focal = _box_extreme(vals, valid, r, stat == "max")
        return pd.DataFrame({
            "tile_id": [m["tile_id"]],
            "image_id": [m["image_id"]],
            "cell": pd.Series([m["cell"]], dtype="uint64"),
            "row_off": pd.Series([m["key_row"]], dtype="int32"),
            "col_off": pd.Series([m["key_col"]], dtype="int32"),
            "h": pd.Series([H], dtype="int32"),
            "w": pd.Series([W], dtype="int32"),
            "bands": pd.Series([p], dtype="int32"),
            "focal": [focal.tobytes()]})

    return assemble


def focal_stat_tiles(tiles, stat="mean", radius=1, scale=1000):
    """Distributed focal statistic over tiled rasters (see module
    docstring). ``stat``: mean | var | max | min.

    Returns a Dataset of focal tiles: the ``focal`` column is the
    little-endian int64 (bands, h, w) payload.
    """
    exploded = tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h", "w",
         "bands", "pixels"]).map_batches(
        make_halo_explode(radius), batch_format="pyarrow")
    return exploded.groupby(["image_id", "key_row", "key_col"]).map_groups(
        make_focal_assemble(radius, scale, stat), batch_format="pandas")


def focal_mean_tiles(tiles, radius=1, scale=1000):
    """Focal mean (the oracle-checked default; see focal_stat_tiles)."""
    return focal_stat_tiles(tiles, "mean", radius, scale)


def focal_band_sums(focal_tiles):
    """Per-(tile, band) sums of the focal values — the compact
    hash-checkable summary used by the oracle query."""

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"tile_id": [], "band": [], "focal_sum_u": []}
        for _, t in df.iterrows():
            p = int(t["bands"])
            arr = np.frombuffer(t["focal"], dtype=np.int64).reshape(
                (p, int(t["h"]), int(t["w"])))
            s = arr.sum(axis=(1, 2))
            rows["tile_id"].extend([t["tile_id"]] * p)
            rows["band"].extend(range(p))
            rows["focal_sum_u"].extend(int(v) for v in s)
        return pd.DataFrame(rows).astype(
            {"band": "int64", "focal_sum_u": "int64"})

    return focal_tiles.map_batches(sums, batch_format="pandas")


def _box_mode(vals, valid, r):
    """Focal MAJORITY (mode) over the valid (2r+1)² window — exact and
    deterministic: the window's values are sorted, per-value counts are
    computed by exhaustive comparison of the k² sorted layers (k²·k²
    integer compares per pixel — trivial for r=1), and ties pick the
    SMALLEST value with the maximal count (argmax hits the first sorted
    layer attaining the max, and equal values are contiguous after the
    sort). Cells outside the image carry a sentinel that sorts last and
    counts zero, so shrunken border windows are handled exactly."""
    p, hp, wp = vals.shape
    H, W = hp - 2 * r, wp - 2 * r
    k = 2 * r + 1
    sentinel = np.int64(np.iinfo(np.int64).max)
    masked = np.where(valid[None, :, :] > 0, vals, sentinel)
    layers = [masked[:, di:di + H, dj:dj + W]
              for di in range(k) for dj in range(k)]
    stack = np.sort(np.stack(layers, axis=0), axis=0)
    counts = np.zeros(stack.shape, dtype=np.int64)
    for i in range(k * k):
        counts[i] = (stack == stack[i:i + 1]).sum(axis=0)
    counts[stack == sentinel] = 0
    idx = counts.argmax(axis=0)
    return np.take_along_axis(stack, idx[None], axis=0)[0]


def _box_median(vals, valid, r):
    """Focal MEDIAN over the valid (2r+1)² window — exact lower median
    (percentile_disc(0.5) rank ceil(v/2), matching the engine's
    grouped-quantile semantics): invalid cells carry a sentinel that
    sorts last, the window's valid count v shrinks at borders, and the
    median is the sorted stack's layer (v+1)//2 − 1. The edge-
    preserving smoother (speckle/salt-noise removal) the linear box
    mean cannot express."""
    p, hp, wp = vals.shape
    H, W = hp - 2 * r, wp - 2 * r
    k = 2 * r + 1
    sentinel = np.int64(np.iinfo(np.int64).max)
    masked = np.where(valid[None, :, :] > 0, vals, sentinel)
    layers = [masked[:, di:di + H, dj:dj + W]
              for di in range(k) for dj in range(k)]
    stack = np.sort(np.stack(layers, axis=0), axis=0)
    vcount = (stack != sentinel).sum(axis=0)
    idx = np.maximum((vcount + 1) // 2 - 1, 0)
    return np.take_along_axis(stack, idx[None], axis=0)[0]


def classify_band0(tiles, div=800, n_classes=8):
    """Map each tile to a single-band CLASSIFICATION payload
    (``clip(band0 // div, 0, n_classes-1)`` as int16) — the upstream of
    a majority-filter smoothing pass. Runs before the halo exchange so
    the exchange carries one small band, not the spectral payload."""

    def cls(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bands = batch["bands"].to_numpy()
        payloads = []
        for i in range(batch.num_rows):
            n = int(hs[i]) * int(ws[i])
            b0 = values[offsets[i]:offsets[i] + n].astype(np.int64)
            c = np.clip(b0 // div, 0, n_classes - 1).astype(np.int16)
            payloads.append(c.tobytes())
        cols = {name: batch[name] for name in batch.column_names
                if name not in ("pixels", "bands")}
        cols["bands"] = pa.array(np.ones(batch.num_rows, np.int32))
        cols["pixels"] = pa.array(payloads, pa.binary())
        return pa.table(cols)

    return tiles.map_batches(cls, batch_format="pyarrow")


def focal_majority_tiles(tiles, radius=1, div=800, n_classes=8):
    """Majority-filter smoothing of a band-0 classification — the
    classic post-classification cleanup — distributed via the same
    halo exchange as every focal stat (see module docstring). The
    classification happens BEFORE the exchange (1 band travels)."""
    return focal_stat_tiles(classify_band0(tiles, div, n_classes),
                            stat="majority", radius=radius)


def focal_class_counts(focal_tiles):
    """Per-(tile, class) histogram of the majority raster — the compact
    hash-checkable summary used by the oracle query."""

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"tile_id": [], "cls": [], "n": []}
        for _, t in df.iterrows():
            arr = np.frombuffer(t["focal"], dtype=np.int64)
            uniq, cnt = np.unique(arr, return_counts=True)
            rows["tile_id"].extend([t["tile_id"]] * len(uniq))
            rows["cls"].extend(int(u) for u in uniq)
            rows["n"].extend(int(c) for c in cnt)
        return pd.DataFrame(rows).astype({"cls": "int64", "n": "int64"})

    return focal_tiles.map_batches(counts, batch_format="pandas")


def make_conv_assemble(kernel):
    """Stage B for general integer CONVOLUTION: one tile + its halo
    strips → per-(tile, band) sums of the kernel response. ``kernel``
    is a (2r+1, 2r+1) int64 array; the radius is derived from it and
    must match the explode stage's. Border rule: pixels whose full
    window leaves the IMAGE contribute 0 and are excluded from
    ``n_valid`` (the terrain-stage rule, not the shrinking-window
    focal-mean rule — a weighted kernel has no natural renormalization
    for partial windows)."""
    kernel = np.asarray(kernel, dtype=np.int64)
    kh, kw = kernel.shape
    assert kh == kw and kh % 2 == 1, "kernel must be odd square"
    r = kh // 2

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "tile_id": pd.Series([], dtype=object),
            "band": pd.Series([], dtype="int64"),
            "conv_sum": pd.Series([], dtype="int64"),
            "n_valid": pd.Series([], dtype="int64")}
        me = g[g["kind"] == 0]
        if not len(me):
            return pd.DataFrame(empty)
        m = me.iloc[0]
        p, H, W = int(m["bands"]), int(m["h"]), int(m["w"])
        vals = np.zeros((p, H + 2 * r, W + 2 * r), dtype=np.int64)
        valid = np.zeros((H + 2 * r, W + 2 * r), dtype=np.int64)
        self_arr = np.frombuffer(m["payload"], dtype=np.int16).reshape(
            (p, H, W))
        vals[:, r:r + H, r:r + W] = self_arr
        valid[r:r + H, r:r + W] = 1
        for _, s in g[g["kind"] == 1].iterrows():
            sh, sw = int(s["h"]), int(s["w"])
            arr = np.frombuffer(s["payload"], dtype=np.int16).reshape(
                (int(s["bands"]), sh, sw))
            pr, pc = int(s["pos_r"]), int(s["pos_c"])
            rs = slice(0, r) if pr < 0 else (
                slice(r + H, r + H + r) if pr > 0 else slice(r, r + H))
            cs = slice(0, r) if pc < 0 else (
                slice(r + W, r + W + r) if pc > 0 else slice(r, r + W))
            vals[:, rs, cs] = arr
            valid[rs, cs] = 1
        acc = np.zeros((p, H, W), dtype=np.int64)
        ok = np.ones((H, W), dtype=np.int64)
        for di in range(kh):
            for dj in range(kw):
                acc += kernel[di, dj] * vals[:, di:di + H, dj:dj + W]
                ok &= valid[di:di + H, dj:dj + W]
        acc *= ok[None, :, :]
        sums = acc.sum(axis=(1, 2))
        return pd.DataFrame({
            "tile_id": [m["tile_id"]] * p,
            "band": pd.Series(range(p), dtype="int64"),
            "conv_sum": pd.Series(sums, dtype="int64"),
            "n_valid": pd.Series([int(ok.sum())] * p, dtype="int64")})

    return assemble


def convolve_tiles(tiles, kernel):
    """Distributed general integer convolution over tiled rasters —
    the raster-calculator kernel op (Gaussian blur, sharpen, emboss…)
    via the same halo exchange as every focal stat; the kernel radius
    sizes the strips (radius 2 ships ~27% strip bytes on 32-px
    tiles). Returns per-(tile, band) response sums + n_valid."""
    kernel = np.asarray(kernel, dtype=np.int64)
    r = kernel.shape[0] // 2
    exploded = tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h", "w",
         "bands", "pixels"]).map_batches(
        make_halo_explode(r), batch_format="pyarrow")
    return exploded.groupby(
        ["image_id", "key_row", "key_col"]).map_groups(
        make_conv_assemble(kernel), batch_format="pandas")

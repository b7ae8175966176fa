"""GLCM texture statistics over tiled rasters (gray-level
co-occurrence counts), with a slim DIRECTED halo exchange.

Texture features are the image-curation signal spectral statistics
miss (blur/noise/synthetic-pattern detection in a training corpus
feeds on co-occurrence structure, not band means). The GLCM for a
displacement (dy, dx) is the count matrix n[la, lb] of quantized
gray-level pairs (pixel, pixel+offset) over the image; contrast /
energy / homogeneity are all plain SQL aggregates over these rows, so
the engine emits the COUNTS and stays hash-checkable.

Scale shape (vs the generic focal halo, stages/focal.py):
- the pair anchored at (r, c) needs only the partner at (r+dy, c+dx),
  so each tile ships exactly ONE leading-edge strip (its first column
  for dx=1, first row for dy=1) to the ONE neighbor that anchors the
  border pairs — not 8 strips. The strip is pruned to the single
  analyzed band BEFORE the exchange, so the shuffle moves
  ~(1 + 1/T)/bands of the corpus (≈ 1.6% for 6-band 32-px tiles)
  instead of focal's ~113%.
- anchor-in-tile partitioning: every image pair has its anchor pixel
  in exactly one tile, so per-tile counts sum to the image GLCM with
  no dedup pass.
- stage B groups are single tiles (+ at most one strip row):
  parallelism = n_tiles, no skew; the per-image merge exchanges only
  (image_id, code, n) rows — ≤ levels² per tile before the per-batch
  combiner, tiny after.

Quantization: level = clip(v, 0, vmax) * levels // (vmax + 1), pure
integer math replicated bit-for-bit by the generation-time sidecar
(sources/synth.py:generate_glcm_expected, full-image replay — a match
proves the halo plumbing and the anchor partitioning, not just the
kernel). NODATA pixels drop out of every pair.

Reference analogue: none — the reference has no texture operators;
this is the engine-new curation family (module contract shared with
stages/focal.py / stages/terrain.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..constants import NODATA
from .decode import binary_views


def quantize_levels(v, levels, vmax):
    """clip(v, 0, vmax) * levels // (vmax + 1) — int64 exact."""
    c = np.clip(v.astype(np.int64), 0, int(vmax))
    return (c * np.int64(levels)) // np.int64(vmax + 1)


def make_glcm_explode(dy=0, dx=1, band=0):
    """Stage A: tile batch → band-pruned self rows + ONE leading-edge
    strip addressed to the neighbor that anchors the border pairs."""
    if (dy, dx) not in ((0, 1), (1, 0)):
        raise ValueError("glcm displacement must be (0,1) or (1,0)")

    def explode(batch: pa.Table) -> pd.DataFrame:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bands = batch["bands"].to_numpy()
        row_off = batch["row_off"].to_numpy()
        col_off = batch["col_off"].to_numpy()
        image_id = batch["image_id"].to_pylist()

        out = {k: [] for k in ("image_id", "key_row", "key_col",
                               "kind", "h", "w", "payload")}

        def emit(img, kr, kc, kind, arr):
            out["image_id"].append(img)
            out["key_row"].append(int(kr))
            out["key_col"].append(int(kc))
            out["kind"].append(kind)
            out["h"].append(arr.shape[0])
            out["w"].append(arr.shape[1])
            out["payload"].append(np.ascontiguousarray(arr).tobytes())

        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            if h != w or (row_off[i] % h) or (col_off[i] % w):
                raise ValueError(
                    "glcm halo exchange requires a uniform tile "
                    f"lattice; got h={h} w={w} at offsets "
                    f"({row_off[i]},{col_off[i]})")
            arr = values[offsets[i]:offsets[i + 1]].reshape(
                (int(bands[i]), h, w))[band]
            emit(image_id[i], row_off[i], col_off[i], 0, arr)
            kr = int(row_off[i]) - dy * h
            kc = int(col_off[i]) - dx * w
            if kr >= 0 and kc >= 0:
                strip = arr[:1, :] if dy else arr[:, :1]
                emit(image_id[i], kr, kc, 1, strip)

        return pd.DataFrame(out).astype({
            "key_row": "int32", "key_col": "int32", "kind": "int8",
            "h": "int32", "w": "int32"})

    return explode


def make_glcm_assemble(levels=16, vmax=9999, dy=0, dx=1):
    """Stage B: one tile (+ its received strip) → nonzero
    (image_id, code, n) co-occurrence partial rows, code = la·levels+lb."""

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        me = g[g["kind"] == 0]
        if not len(me):
            return pd.DataFrame({
                "image_id": pd.Series([], dtype=object),
                "code": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64")})
        m = me.iloc[0]
        H, W = int(m["h"]), int(m["w"])
        arr = np.frombuffer(m["payload"], dtype=np.int16).reshape((H, W))
        st = g[g["kind"] == 1]
        if dy:
            a = arr[:-1, :].ravel()
            b = arr[1:, :].ravel()
        else:
            a = arr[:, :-1].ravel()
            b = arr[:, 1:].ravel()
        if len(st):
            s = st.iloc[0]
            strip = np.frombuffer(s["payload"], dtype=np.int16).reshape(
                (int(s["h"]), int(s["w"])))
            a = np.concatenate([a, (arr[-1, :] if dy
                                    else arr[:, -1]).ravel()])
            b = np.concatenate([b, strip.ravel()])
        ok = (a != NODATA) & (b != NODATA)
        code = (quantize_levels(a[ok], levels, vmax) * np.int64(levels)
                + quantize_levels(b[ok], levels, vmax))
        cnt = np.bincount(code, minlength=levels * levels)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({
            "image_id": [m["image_id"]] * len(nz),
            "code": nz.astype(np.int64),
            "n": cnt[nz].astype(np.int64)})

    return assemble


def glcm_counts(tiles, levels=16, vmax=9999, dy=0, dx=1, band=0):
    """Distributed per-image GLCM: (image_id, la, lb, n) rows for the
    displacement (dy, dx) over quantized band ``band`` (see module
    docstring). The per-batch combiner sums codes before the final
    (image_id, code) exchange."""
    from ray.data.aggregate import Sum

    exploded = tiles.select_columns(
        ["image_id", "row_off", "col_off", "h", "w", "bands",
         "pixels"]).map_batches(
        make_glcm_explode(dy=dy, dx=dx, band=band),
        batch_format="pyarrow")
    partials = exploded.groupby(
        ["image_id", "key_row", "key_col"]).map_groups(
        make_glcm_assemble(levels=levels, vmax=vmax, dy=dy, dx=dx),
        batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["image_id", "code"], sort=False)["n"].sum()
        return c.reset_index().astype({"code": "int64", "n": "int64"})

    merged = partials.map_batches(combine, batch_format="pandas")\
        .groupby(["image_id", "code"]).aggregate(
            Sum("n", alias_name="n"))

    def unpack(df: pd.DataFrame) -> pd.DataFrame:
        code = df["code"].to_numpy(np.int64)
        return pd.DataFrame({
            "image_id": df["image_id"],
            "la": code // levels,
            "lb": code % levels,
            "n": df["n"].astype(np.int64)})

    return merged.map_batches(unpack, batch_format="pandas")

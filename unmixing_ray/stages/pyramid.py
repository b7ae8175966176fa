"""Image pyramid / overview construction over tiled rasters — the
standard raster-serving prep op (GDAL BuildOverviews, COG overview
levels) re-expressed for the tiled-at-scale regime.

Distribution shape — a spatial REDUCTION TREE, the complement of the
focal halo exchange (stages/focal.py):

- stage A (``map_batches``): every tile block-sums ITSELF down by
  ``factor`` (each factor×factor block lies wholly inside one child, so
  the decimation is local and the exchange carries 1/factor² of the
  corpus bytes — never raw pixels);
- stage B (``groupby(image_id, prow, pcol).map_groups``): up to
  factor² downsampled children assemble into one parent tile; the
  block mean is ``sum // factor²`` (floor), exact int64 and therefore
  batching/partitioning-invariant and hash-checkable.

Partitioning assumptions (engine contract): tiles of one image form a
uniform lattice (asserted loudly); parents at the image's high edges
may have fewer children and shrink to the covered extent. Group key is
the parent tile → parallelism = n_parents, no skew. Recursion
(``build_pyramid``) feeds level L's parents in as level L+1's children,
giving GDAL-style floor-mean-of-floor-mean semantics per level.

Reference analogue: none — the reference holds whole rasters in RAM
(utils.py as_array) and never builds overviews; this operator exists
for the 100-TB tile-serving path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .decode import binary_views


def make_overview_decimate(factor=2, in_dtype=np.int16,
                           pixels_col="pixels"):
    """Stage A: tile batch → per-child block sums + parent address."""
    f = int(factor)

    def decimate(batch: pa.Table) -> pd.DataFrame:
        values, offsets = binary_views(batch[pixels_col], in_dtype)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bands = batch["bands"].to_numpy()
        row_off = batch["row_off"].to_numpy()
        col_off = batch["col_off"].to_numpy()
        image_id = batch["image_id"].to_pylist()
        out = {k: [] for k in ("image_id", "prow", "pcol", "sub_r",
                               "sub_c", "ch", "cw", "bands", "payload")}
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            if h != w or (row_off[i] % h) or (col_off[i] % w) \
                    or (h % f) or (w % f):
                raise ValueError(
                    "overview build requires a uniform factor-divisible "
                    f"tile lattice; got h={h} w={w} at offsets "
                    f"({row_off[i]},{col_off[i]})")
            p = int(bands[i])
            arr = values[offsets[i]:offsets[i + 1]].reshape((p, h, w))
            # block sums: (p, h/f, f, w/f, f) -> sum over the f axes
            s = arr.astype(np.int64).reshape(
                (p, h // f, f, w // f, f)).sum(axis=(2, 4))
            tr, tc = int(row_off[i]) // h, int(col_off[i]) // w
            out["image_id"].append(image_id[i])
            out["prow"].append(tr // f)
            out["pcol"].append(tc // f)
            out["sub_r"].append(tr % f)
            out["sub_c"].append(tc % f)
            out["ch"].append(h // f)
            out["cw"].append(w // f)
            out["bands"].append(p)
            out["payload"].append(s.tobytes())
        return pd.DataFrame(out).astype({
            "prow": "int32", "pcol": "int32", "sub_r": "int8",
            "sub_c": "int8", "ch": "int32", "cw": "int32",
            "bands": "int32"})

    return decimate


def make_overview_assemble(factor=2):
    """Stage B: ≤ factor² downsampled children → one parent tile of
    floor block means (``pixels`` = little-endian int64 (bands,h,w))."""
    f = int(factor)
    div = np.int64(f * f)

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        m = g.iloc[0]
        p, ch, cw = int(m["bands"]), int(m["ch"]), int(m["cw"])
        hs = (int(g["sub_r"].max()) + 1) * ch
        ws = (int(g["sub_c"].max()) + 1) * cw
        acc = np.zeros((p, hs, ws), dtype=np.int64)
        for _, c in g.iterrows():
            arr = np.frombuffer(c["payload"], dtype=np.int64).reshape(
                (int(c["bands"]), ch, cw))
            r0, c0 = int(c["sub_r"]) * ch, int(c["sub_c"]) * cw
            acc[:, r0:r0 + ch, c0:c0 + cw] = arr
        means = acc // div
        # parent lattice offsets are in PARENT-resolution pixels, so the
        # output is itself a valid uniform tile lattice for recursion
        return pd.DataFrame({
            "image_id": [m["image_id"]],
            "prow": pd.Series([int(m["prow"])], dtype="int32"),
            "pcol": pd.Series([int(m["pcol"])], dtype="int32"),
            "row_off": pd.Series([int(m["prow"]) * f * ch],
                                 dtype="int32"),
            "col_off": pd.Series([int(m["pcol"]) * f * cw],
                                 dtype="int32"),
            "h": pd.Series([hs], dtype="int32"),
            "w": pd.Series([ws], dtype="int32"),
            "bands": pd.Series([p], dtype="int32"),
            "pixels": [means.tobytes()]})

    return assemble


def build_overview(tiles, factor=2, in_dtype=np.int16):
    """One overview level over a tile Dataset (columns image_id,
    row_off, col_off, h, w, bands, pixels). Returns the parent-tile
    Dataset in the same lattice schema with int64 ``pixels``."""
    dec = tiles.select_columns(
        ["image_id", "row_off", "col_off", "h", "w", "bands",
         "pixels"]).map_batches(
        make_overview_decimate(factor, in_dtype), batch_format="pyarrow")
    return dec.groupby(["image_id", "prow", "pcol"]).map_groups(
        make_overview_assemble(factor), batch_format="pandas")


def build_pyramid(tiles, levels=2, factor=2, in_dtype=np.int16):
    """GDAL-style overview stack: returns [level1, level2, ...] where
    level L+1 is built from level L's parents (floor mean of floor
    means). Each level is a lazy Dataset; consuming several levels
    re-executes the shared prefix — materialize intermediate levels to
    parquet when building many."""
    out = []
    cur, dt = tiles, in_dtype
    for _ in range(levels):
        cur = build_overview(cur, factor, dt)
        dt = np.int64
        out.append(cur)
    return out


def overview_band_sums(ov_tiles):
    """Per-(parent, band) int64 sums — the compact hash-checkable
    summary the oracle query compares against the full-image sidecar."""

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"ov_id": [], "band": [], "ov_sum_u": []}
        for _, t in df.iterrows():
            p = int(t["bands"])
            arr = np.frombuffer(t["pixels"], dtype=np.int64).reshape(
                (p, int(t["h"]), int(t["w"])))
            s = arr.sum(axis=(1, 2))
            oid = "%s_o%d_%d" % (t["image_id"], int(t["prow"]),
                                 int(t["pcol"]))
            rows["ov_id"].extend([oid] * p)
            rows["band"].extend(range(p))
            rows["ov_sum_u"].extend(int(v) for v in s)
        return pd.DataFrame(rows).astype(
            {"band": "int64", "ov_sum_u": "int64"})

    return ov_tiles.map_batches(sums, batch_format="pandas")

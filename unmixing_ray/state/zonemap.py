"""Zone-map-pruned storage: sorted partitioned write + min/max skipping.

The 'prune at the read' machinery made a first-class, verifiable
operator (every columnar warehouse's file-skipping layer: Parquet
row-group stats, Iceberg/Delta manifests, ClickHouse marks): rows are
written SORTED by a key into N equal-count files (exact ANSI ntile
split, so the layout is closed-form replayable in SQL), each file's
(min, max, count) forms the zone map, and a range query consults the
16-row map on the driver and READS ONLY the overlapping files.

The oracle checks the pruning itself, not just the answer: files_read
and rows_scanned are derived in SQL from the same ntile layout — a
hash match proves the engine's physical layout, its zone map, and the
skip decision all agree with the logical spec.

Scale shape: the layout pass is the engine's exact distributed
row_number (relational.global_rank — bottom-m boundaries + per-bucket
prefix-sum bases); the zone map is one n_files-row aggregate; the
pruned count re-reads ONLY selected partition directories with a
column-pruned filter scan. Nothing but the n_files-row map ever
reaches the driver.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd


def ntile_of_rank(rank, n, k):
    """ANSI ntile(k) group (0-based) of 1-based ``rank`` over ``n``
    rows: the first n % k groups take ceil(n/k) rows."""
    rank = np.asarray(rank, dtype=np.int64)
    big = n % k
    hi = n // k + 1
    thresh = big * hi
    early = (rank - 1) // hi
    late = big + (rank - 1 - thresh) // max(1, n // k)
    return np.where(rank <= thresh, early, late).astype(np.int64)


def write_sorted_zonemap(ds, order_col, id_col, out_dir, n_files=16):
    """Sort ``ds`` by (order_col, id_col), split into ``n_files``
    exact-ntile partition dirs under ``out_dir``, return the zone map
    as a driver DataFrame (f, zmin, zmax, n). Idempotent per out_dir
    (re-created only when absent)."""
    from ..stages.relational import global_rank

    n = ds.count()
    done = os.path.join(out_dir, "_ZONE_DONE")
    ranked = global_rank(ds, order_col=order_col, id_col=id_col,
                         n_buckets=32)

    def add_file(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["f"] = ntile_of_rank(df["rank"].to_numpy(), n, n_files)
        return df

    filed = ranked.map_batches(add_file, batch_format="pandas")
    if not os.path.exists(done):
        shutil.rmtree(out_dir, ignore_errors=True)
        filed.write_parquet(out_dir, partition_cols=["f"])
        open(done, "w").write("n=%d k=%d" % (n, n_files))
    from ray.data.aggregate import Count, Max, Min
    zmap = filed.groupby("f").aggregate(
        Min(order_col, alias_name="zmin"),
        Max(order_col, alias_name="zmax"),
        Count(alias_name="n")).to_pandas()
    return zmap.sort_values("f").reset_index(drop=True)


def pruned_range_count(out_dir, zmap, order_col, lo, hi):
    """Answer COUNT(*) WHERE lo <= v <= hi by reading ONLY zone-map-
    overlapping partition dirs. Returns one row (n_match, files_total,
    files_read, rows_scanned)."""
    import pyarrow.dataset as pads

    sel = zmap[(zmap["zmax"] >= lo) & (zmap["zmin"] <= hi)]
    n_match = 0
    for f in sel["f"]:
        part = os.path.join(out_dir, "f=%d" % int(f))
        d = pads.dataset(part, format="parquet")
        t = d.to_table(columns=[order_col])
        v = t[order_col].to_numpy(zero_copy_only=False)
        n_match += int(((v >= lo) & (v <= hi)).sum())
    return pd.DataFrame({
        "n_match": pd.Series([n_match], dtype="int64"),
        "files_total": pd.Series([len(zmap)], dtype="int64"),
        "files_read": pd.Series([len(sel)], dtype="int64"),
        "rows_scanned": pd.Series([int(sel["n"].sum())],
                                  dtype="int64")})


def morton2(bx, by, bits=3):
    """Interleave two ``bits``-bit bucket indices into a Z-order code
    (x in even positions) — small enough to replay as closed-form SQL
    bit arithmetic."""
    bx = np.asarray(bx, dtype=np.int64)
    by = np.asarray(by, dtype=np.int64)
    z = np.zeros_like(bx)
    for i in range(bits):
        z |= ((bx >> i) & 1) << (2 * i)
        z |= ((by >> i) & 1) << (2 * i + 1)
    return z


def _morton2_sql(bx, by, bits=3):
    terms = []
    for i in range(bits):
        terms.append(f"((({bx}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({by}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def write_zorder_zonemap(ds_xy, out_dir, n_files=16, bits=3):
    """Two-column clustered layout (Delta/Iceberg Z-ORDER BY): rows of
    ``ds_xy`` (columns id:int64, x:int64, y:int64) are bucketed per
    dimension by exact integer cross-multiplication over the global
    min/max (one tiny aggregate pass), interleaved into a Morton code,
    laid out into ``n_files`` exact-ntile files sorted by (zcode, id),
    and each file's zone map keeps min/max of BOTH x and y — so a
    2-predicate query can skip files on either dimension, which a
    1-D sorted layout cannot. Returns (zmap DataFrame, layout params).

    Scale shape: identical to write_sorted_zonemap — the layout pass is
    the exact distributed row_number over the zcode, the map is one
    n_files-row aggregate; only min/max scalars and the map reach the
    driver."""
    from ray.data.aggregate import Count, Max, Min

    from ..stages.relational import global_rank

    mm = ds_xy.aggregate(Min("x"), Max("x"), Min("y"), Max("y"))
    xmin, xmax = int(mm["min(x)"]), int(mm["max(x)"])
    ymin, ymax = int(mm["min(y)"]), int(mm["max(y)"])
    b = 1 << bits
    xspan = xmax - xmin + 1
    yspan = ymax - ymin + 1

    def add_z(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        bx = (df["x"].to_numpy(np.int64) - xmin) * b // xspan
        by = (df["y"].to_numpy(np.int64) - ymin) * b // yspan
        df["zc"] = morton2(bx, by, bits)
        return df

    zds = ds_xy.map_batches(add_z, batch_format="pandas")
    n = ds_xy.count()
    ranked = global_rank(zds, order_col="zc", id_col="id", n_buckets=32,
                         keep=("x", "y"))

    def add_file(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["f"] = ntile_of_rank(df["rank"].to_numpy(), n, n_files)
        return df

    filed = ranked.map_batches(add_file, batch_format="pandas")
    done = os.path.join(out_dir, "_ZONE_DONE")
    if not os.path.exists(done):
        shutil.rmtree(out_dir, ignore_errors=True)
        filed.write_parquet(out_dir, partition_cols=["f"])
        open(done, "w").write("n=%d k=%d" % (n, n_files))
    zmap = filed.groupby("f").aggregate(
        Min("x", alias_name="xmin"), Max("x", alias_name="xmax"),
        Min("y", alias_name="ymin"), Max("y", alias_name="ymax"),
        Count(alias_name="n")).to_pandas()
    return zmap.sort_values("f").reset_index(drop=True)


def pruned_box_count(out_dir, zmap, xlo, xhi, ylo, yhi):
    """Answer COUNT(*) WHERE x BETWEEN xlo AND xhi AND y BETWEEN ylo
    AND yhi reading ONLY files whose zone map overlaps BOTH ranges."""
    import pyarrow.dataset as pads

    sel = zmap[(zmap["xmax"] >= xlo) & (zmap["xmin"] <= xhi) &
               (zmap["ymax"] >= ylo) & (zmap["ymin"] <= yhi)]
    n_match = 0
    for f in sel["f"]:
        part = os.path.join(out_dir, "f=%d" % int(f))
        d = pads.dataset(part, format="parquet")
        t = d.to_table(columns=["x", "y"])
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        n_match += int(((x >= xlo) & (x <= xhi) &
                        (y >= ylo) & (y <= yhi)).sum())
    return pd.DataFrame({
        "n_match": pd.Series([n_match], dtype="int64"),
        "files_total": pd.Series([len(zmap)], dtype="int64"),
        "files_read": pd.Series([len(sel)], dtype="int64"),
        "rows_scanned": pd.Series([int(sel["n"].sum())],
                                  dtype="int64")})


def zorder_sql(id_expr, x_expr, y_expr, table, xlo, xhi, ylo, yhi,
               n_files=16, bits=3):
    """DuckDB replay of the Z-order layout, two-column zone map, skip
    decision and box count — files_read/rows_scanned are hash-checked,
    proving the physical clustering agrees with the logical spec."""
    b = 1 << bits
    return f"""
        WITH v AS (
          SELECT {id_expr} AS id, {x_expr} AS x, {y_expr} AS y
          FROM {table}),
        mm AS (SELECT min(x) AS xmin, max(x) AS xmax,
                      min(y) AS ymin, max(y) AS ymax FROM v),
        bkt AS (
          SELECT id, x, y,
                 ((x - mm.xmin) * {b}) // (mm.xmax - mm.xmin + 1) AS bx,
                 ((y - mm.ymin) * {b}) // (mm.ymax - mm.ymin + 1) AS by
          FROM v, mm),
        z AS (SELECT id, x, y,
                     {_morton2_sql('bx', 'by', bits)} AS zc
              FROM bkt),
        s AS (SELECT x, y,
                     ntile({n_files}) OVER (ORDER BY zc, id) - 1 AS f
              FROM z),
        m AS (SELECT f, min(x) AS xmin, max(x) AS xmax,
                     min(y) AS ymin, max(y) AS ymax, count(*) AS n
              FROM s GROUP BY f),
        sel AS (SELECT * FROM m
                WHERE xmax >= {xlo} AND xmin <= {xhi}
                  AND ymax >= {ylo} AND ymin <= {yhi})
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM v
                WHERE x BETWEEN {xlo} AND {xhi}
                  AND y BETWEEN {ylo} AND {yhi}) AS n_match,
               (SELECT CAST(count(*) AS BIGINT) FROM m)
                 AS files_total,
               (SELECT CAST(count(*) AS BIGINT) FROM sel)
                 AS files_read,
               (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM sel)
                 AS rows_scanned"""


def zonemap_sql(table, order_col, id_col, lo, hi, n_files=16):
    """DuckDB replay: the same ntile layout, zone map, skip decision
    and range count, all from the logical table."""
    return f"""
        WITH s AS (
          SELECT {order_col} AS v,
                 ntile({n_files}) OVER (
                   ORDER BY {order_col}, {id_col}) - 1 AS f
          FROM {table}),
        z AS (SELECT f, min(v) AS zmin, max(v) AS zmax,
                     count(*) AS n
              FROM s GROUP BY f),
        sel AS (SELECT * FROM z WHERE zmax >= {lo} AND zmin <= {hi})
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM {table}
                WHERE {order_col} BETWEEN {lo} AND {hi}) AS n_match,
               (SELECT CAST(count(*) AS BIGINT) FROM z)
                 AS files_total,
               (SELECT CAST(count(*) AS BIGINT) FROM sel)
                 AS files_read,
               (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM sel)
                 AS rows_scanned"""

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

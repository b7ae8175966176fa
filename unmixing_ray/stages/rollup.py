"""Hierarchical cell rollup — multi-level spatial aggregation.

Engine-new (no reference analogue; the reference has no spatial index).
The H3/S2 pattern of "aggregate at the finest cell, then roll up to
coarser resolutions" is expressed as ONE shuffle: a per-batch combiner
emits partial counts for EVERY requested level (parent cells are pure
bit arithmetic, :func:`unmixing_ray.cellindex.parent`), so the exchange
carries at most ``n_unique_cells_per_batch × n_levels`` small rows and
the final ``groupby(cell).sum`` is exact. At 10^12 tiles the rollup
never re-reads or re-shuffles the tile payloads — only cell ids travel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from unmixing_ray import cellindex


def cell_rollup(tiles, base_level, steps=(0, 1, 2, 3)):
    """Tile counts per cell at ``base_level - s`` for each ``s`` in
    ``steps``. ``tiles`` must carry a uint64 ``cell`` column at
    ``base_level``. Returns (level, cell_ix, cell_iy, n_tiles) rows.

    Combiner-before-shuffle: each batch reduces to unique (cell, count)
    partials per level; one groupby("cell") merges them (the level is
    packed inside the cell id, so a single key covers all levels).
    """
    steps = sorted(set(int(s) for s in steps))
    if steps[0] < 0 or base_level - steps[-1] < 0:
        raise ValueError("rollup steps out of range for base_level")

    def partial(batch: pa.Table) -> pa.Table:
        cells = np.asarray(batch["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.uint64)
        out_cell, out_n = [], []
        for s in steps:
            pc = cellindex.parent(cells, s) if s else cells
            uniq, cnt = np.unique(pc, return_counts=True)
            out_cell.append(uniq)
            out_n.append(cnt.astype(np.int64))
        return pa.table({
            "cell": pa.array(np.concatenate(out_cell), pa.uint64()),
            "n": pa.array(np.concatenate(out_n), pa.int64())})

    parts = tiles.select_columns(["cell"]).map_batches(
        partial, batch_format="pyarrow")
    merged = parts.groupby("cell").sum("n")

    def finish(batch: pa.Table) -> pa.Table:
        cells = np.asarray(batch["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.uint64)
        ix, iy, level = cellindex.cell_to_ixiy(cells)
        return pa.table({
            "level": pa.array(level, pa.int64()),
            "cell_ix": pa.array(ix, pa.int64()),
            "cell_iy": pa.array(iy, pa.int64()),
            "n_tiles": pa.array(
                np.asarray(batch["sum(n)"].to_numpy(zero_copy_only=False),
                           dtype=np.int64), pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def cell_rollup_sql(tiles_expected_path, base_level, steps=(0, 1, 2, 3)):
    """DuckDB oracle: the same rollup straight off the closed-form tile
    lattice sidecar (cell_ix/cell_iy at ``base_level``)."""
    legs = []
    for s in sorted(set(int(s) for s in steps)):
        legs.append(f"""
            SELECT CAST({base_level - s} AS BIGINT) AS level,
                   CAST(cell_ix // {1 << s} AS BIGINT) AS cell_ix,
                   CAST(cell_iy // {1 << s} AS BIGINT) AS cell_iy,
                   CAST(count(*) AS BIGINT) AS n_tiles
            FROM read_parquet('{tiles_expected_path}')
            GROUP BY 1, 2, 3""")
    return " UNION ALL ".join(legs)


def cell_density(tiles, ring=1, level_bits=12):
    """3x3 (king-move) neighborhood tile density per cell — the
    spatial hot-spot statistic that drives salting decisions: for every
    cell within ``ring`` of an occupied cell, the number of tiles in
    its (2·ring+1)² neighborhood. Combiner-before-shuffle: each batch
    counts tiles per cell locally, then emits ONE (jx, jy, n) partial
    row per (occupied cell x 9 offsets) — the exchange never carries a
    tile row — and a groupby sums partials. Keys are small int64
    lattice coords (never raw uint64 Morton ids through an aggregate —
    see stages/trend.py). Offsets are clipped at the level's lattice
    bounds, matching cellindex.neighbors."""
    from .. import cellindex

    def partial(batch: pa.Table) -> pd.DataFrame:
        cells = np.asarray(batch["cell"].to_numpy(zero_copy_only=False),
                           dtype=np.uint64)
        ix, iy, _lv = cellindex.cell_to_ixiy(cells)
        cnt = {}
        for a, b in zip(ix.astype(np.int64), iy.astype(np.int64)):
            k = (int(a), int(b))
            cnt[k] = cnt.get(k, 0) + 1
        n = (1 << level_bits) - 1
        out = {}
        for (a, b), c in cnt.items():
            for dy in range(-ring, ring + 1):
                for dx in range(-ring, ring + 1):
                    jx, jy = a + dx, b + dy
                    if 0 <= jx <= n and 0 <= jy <= n:
                        k = (jx, jy)
                        out[k] = out.get(k, 0) + c
        keys = list(out.keys())
        return pd.DataFrame({
            "cell_ix": pd.Series([k[0] for k in keys], dtype="int64"),
            "cell_iy": pd.Series([k[1] for k in keys], dtype="int64"),
            "n": pd.Series([out[k] for k in keys], dtype="int64")})

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cell_ix": batch["cell_ix"].cast(pa.int64()),
            "cell_iy": batch["cell_iy"].cast(pa.int64()),
            "n_tiles": batch["sum(n)"].cast(pa.int64())})

    return tiles.select_columns(["cell"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["cell_ix", "cell_iy"]).sum("n") \
        .map_batches(rename, batch_format="pyarrow")


def morans_ingredients(cells):
    """Global Moran's I spatial autocorrelation — reduced to its six
    EXACT int64 ingredients over the occupied cell lattice with
    rook (4-neighbor) contiguity weights (engine-new; the classic
    global spatial statistic, Moran 1950):

        n, Σv, Σv², W (directed neighbor-pair count),
        Σ_pairs v_s (= Σᵢ degᵢ·vᵢ), Σ_pairs v_s·v_t

    I = (n/W) · (Σcross − 2μ·Σdeg_v + μ²·W) / (Σv² − n·μ²) with
    μ = Σv/n is pure driver/SQL postprocessing on exact integers —
    the float never enters the distributed result (the
    ratio-ingredient discipline of tpch_q14 / lineitem_moments).

    Scale shape: directed neighbor pairs are generated per batch
    (4 per node, lattice-wrap guarded), occupancy-filtered by ONE
    semi_join, and values attach through TWO partitioned hash joins
    (source then target); everything else is per-batch fold + a
    one-row aggregate. No all-pairs anywhere: the pair table is
    bounded by 4n.

    ``cells``: Dataset with int64 ``v`` (packed ix·2²¹ + iy, distinct)
    and int64 ``val``. Returns one pandas row."""
    from ray.data.aggregate import Sum
    from .relational import semi_join, hash_join

    PACK = np.int64(1) << 21
    offs = np.array([PACK, 1, -PACK, -1], dtype=np.int64)

    def cands(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        iy = v % PACK
        ix = v // PACK
        ok_by = [np.ones(len(v), dtype=bool), iy < PACK - 1,
                 ix > 0, iy > 0]
        ss, tt = [], []
        for d in range(4):
            ok = ok_by[d]
            ss.append(v[ok])
            tt.append(v[ok] + offs[d])
        return pd.DataFrame({"s": np.concatenate(ss),
                             "t": np.concatenate(tt)})

    pairs = semi_join(cells.map_batches(cands, batch_format="pandas"),
                      cells, "t", right_key="v")
    vs = cells.map_batches(
        lambda df: pd.DataFrame({"s": df["v"].astype("int64"),
                                 "val_s": df["val"].astype("int64")}),
        batch_format="pandas")
    vt = cells.map_batches(
        lambda df: pd.DataFrame({"t": df["v"].astype("int64"),
                                 "val_t": df["val"].astype("int64")}),
        batch_format="pandas")
    p1 = hash_join(pairs, vs, "s", left_cols=["t"],
                   right_cols=["val_s"])
    p2 = hash_join(p1, vt, "t", left_cols=["val_s"],
                   right_cols=["val_t"])

    def fold_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df["val_s"].to_numpy(np.int64)
        b = df["val_t"].to_numpy(np.int64)
        return pd.DataFrame({
            "one": [np.int64(1)],
            "w_pairs": [np.int64(len(df))],
            "sum_deg_v": [np.int64(a.sum())],
            "sum_cross": [np.int64((a * b).sum())]})

    pair_row = p2.map_batches(fold_pairs, batch_format="pandas")\
        .groupby("one").aggregate(
        Sum("w_pairs", alias_name="w_pairs"),
        Sum("sum_deg_v", alias_name="sum_deg_v"),
        Sum("sum_cross", alias_name="sum_cross")).to_pandas()

    def fold_cells(df: pd.DataFrame) -> pd.DataFrame:
        x = df["val"].to_numpy(np.int64)
        return pd.DataFrame({
            "one": [np.int64(1)],
            "n": [np.int64(len(df))],
            "sum_v": [np.int64(x.sum())],
            "sum_v2": [np.int64((x * x).sum())]})

    cell_row = cells.map_batches(fold_cells, batch_format="pandas")\
        .groupby("one").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_v", alias_name="sum_v"),
        Sum("sum_v2", alias_name="sum_v2")).to_pandas()

    return pd.DataFrame({
        "n": cell_row["n"].astype("int64"),
        "sum_v": cell_row["sum_v"].astype("int64"),
        "sum_v2": cell_row["sum_v2"].astype("int64"),
        "w_pairs": pair_row["w_pairs"].astype("int64"),
        "sum_deg_v": pair_row["sum_deg_v"].astype("int64"),
        "sum_cross": pair_row["sum_cross"].astype("int64")})


def spatial_block_split(tile_cells, block_shift=2, val_rate=0.20,
                        test_rate=0.20, seed=0):
    """Spatially-BLOCKED train/val/test split — the leakage-safe form
    of relational.split_assign for geospatial learning: neighboring
    tiles are strongly autocorrelated, so an id-hash split leaks
    train information into val/test through spatial proximity. Here
    the fold is a pure function of the tile's COARSE CELL BLOCK
    (cell_ix//2^shift, cell_iy//2^shift): every tile in a block lands
    in the same fold, and block edges are the only contamination
    surface (grows as block perimeter, not area).

    Stateless one-pass map (md5 of the block key against fixed
    thresholds, split_assign's discipline — reproducible across runs,
    partitionings, engines and corpus growth). Returns (tile_id, bx,
    by, split)."""
    import hashlib

    t_val = "%08x" % int(val_rate * (1 << 32))
    t_test = "%08x" % int((val_rate + test_rate) * (1 << 32))
    d = 1 << block_shift

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        bx = df["cell_ix"].to_numpy(np.int64) // d
        by = df["cell_iy"].to_numpy(np.int64) // d
        h = np.array([hashlib.md5(("%d_%d:%d" % (x, y, seed))
                                  .encode()).hexdigest()[:8]
                      for x, y in zip(bx, by)])
        split = np.where(h < t_val, "val",
                         np.where(h < t_test, "test", "train"))
        return pd.DataFrame({"tile_id": df["tile_id"].to_numpy(),
                             "bx": bx, "by": by, "split": split})

    return tile_cells.map_batches(fn, batch_format="pandas")


def spatial_block_split_sql(tiles_parquet, block_shift=2,
                            val_rate=0.20, test_rate=0.20, seed=0):
    t_val = "%08x" % int(val_rate * (1 << 32))
    t_test = "%08x" % int((val_rate + test_rate) * (1 << 32))
    d = 1 << block_shift
    h = ("substr(md5(CAST(cell_ix // %d AS VARCHAR) || '_' || "
         "CAST(cell_iy // %d AS VARCHAR) || ':%d'), 1, 8)"
         % (d, d, seed))
    return f"""
        SELECT tile_id,
               CAST(cell_ix // {d} AS BIGINT) AS bx,
               CAST(cell_iy // {d} AS BIGINT) AS by,
               CASE WHEN {h} < '{t_val}' THEN 'val'
                    WHEN {h} < '{t_test}' THEN 'test'
                    ELSE 'train' END AS split
        FROM read_parquet('{tiles_parquet}')"""

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

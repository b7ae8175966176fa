"""Skew handling: cell-count pre-pass + salting for hot keys.

North-rule: "skew-aware H3-cell salting on hot tiles". The pattern
(SURVEY.md §4.2): a cheap ``groupby(cell).count()`` pre-pass finds hot
cells; rows in hot cells get ``salt = hash(tile_id) % k`` so a downstream
``groupby([cell, salt])`` splits each hot group across k reducers. Safe
whenever per-row work is independent within the group (joins, unmixing,
per-tile writes); NOT applied to composites whose reducer needs all dates
of a pixel together (there the salt key would have to be a spatial
sub-block — see stages/composite.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def cell_counts(ds, col="cell"):
    """Pre-pass: per-key row counts (small result, collected).

    Pre-aggregates per batch on the KEY COLUMN ONLY before the shuffle —
    a bare groupby-count would shuffle every column (the pre-pass over a
    590 MB pixel table cost more than the salting saved)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.select([col])[col].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(keys, return_counts=True)
        return pa.table({col: pa.array(vals),
                         "n": pa.array(cnts.astype(np.int64))})

    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow")
    out = partials.groupby(col).aggregate(
        Sum("n", alias_name="n")).to_pandas()
    return dict(zip(out[col].tolist(), out["n"].tolist()))


def _stable_hash(s):
    return int.from_bytes(
        hashlib.blake2b(str(s).encode(), digest_size=8).digest(), "little")


def plan_salts(counts, hot_threshold, max_salt=16):
    """key → salt factor (1 for cold keys)."""
    plan = {}
    for key, n in counts.items():
        if n > hot_threshold:
            plan[key] = int(min(max_salt, int(np.ceil(n / hot_threshold))))
    return plan


def make_add_salt(salt_plan, key_col="cell", id_col="tile_id"):
    """map_batches fn adding a ``salt`` int32 column: deterministic
    hash(id) % k for hot keys, 0 elsewhere."""

    def add_salt(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        ids = batch[id_col].to_pylist()
        salts = np.zeros(batch.num_rows, dtype=np.int32)
        for i, (k, rid) in enumerate(zip(keys, ids)):
            factor = salt_plan.get(k, 1)
            if factor > 1:
                salts[i] = _stable_hash(rid) % factor
        return batch.append_column("salt", pa.array(salts, pa.int32()))

    return add_salt


def salted_groupby(ds, key_col, fn, hot_threshold=1024, id_col="tile_id",
                   batch_format="pyarrow", max_salt=16):
    """groupby(key) with automatic salting of hot keys.

    ``fn`` receives each (key, salt) sub-group; results are returned as
    one Dataset (per-salt results are NOT merged — use only when fn is
    per-row independent or result rows are mergeable downstream).
    """
    counts = cell_counts(ds, key_col)
    plan = plan_salts(counts, hot_threshold, max_salt)
    if not plan:
        return ds.groupby(key_col).map_groups(fn,
                                              batch_format=batch_format)
    salted = ds.map_batches(make_add_salt(plan, key_col, id_col),
                            batch_format="pyarrow")
    return salted.groupby([key_col, "salt"]).map_groups(
        fn, batch_format=batch_format)

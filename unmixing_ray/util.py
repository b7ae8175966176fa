"""Small plain-Python utilities mirroring reference helpers."""

from __future__ import annotations


def combine_dicts(*dicts):
    """Merge dictionaries-of-lists by extending per key.
    Reference: utils.py:283-306 (idempotence pinned test/tests.py:398-410).
    """
    out = {}
    keys = set()
    for d in dicts:
        keys |= set(d.keys())
    for key in keys:
        for d in dicts:
            if key not in d:
                continue
            out.setdefault(key, []).extend(d[key])
    return out


def bounded_blocks(ds, rows_per_block=65536, floor=8):
    """Row-aware block-count discipline for iterative union+sort/groupby
    operators (the cluster-resolution tiny-block lesson, r4 commit
    838f9e4): per-round exchange cost scales with BLOCK count, not rows
    — a working set inherited as hundreds of near-empty upstream blocks
    pays hundreds of task launches per barrier, making round cost grow
    with upstream block count instead of data (5 s → 107 s at bench
    scale before the fix). Materializes ``ds`` and re-buckets it to
    ``max(floor, rows // rows_per_block + 1)`` blocks whenever the
    current count exceeds that target; at O(rows)-scale inputs the
    row-derived target exceeds the incoming block count and this is a
    no-op (unlike a fixed width, which would squeeze a billion-row
    working set into ``floor`` blocks). Shrink-only: growing the block
    count is a pure extra shuffle that the next round's own exchange
    already provides. Returns the materialized Dataset."""
    ds = ds.materialize()
    n = ds.count()
    target = max(int(floor), n // int(rows_per_block) + 1)
    if ds.num_blocks() > target:
        ds = ds.repartition(target).materialize()
    return ds


def partition(n, num_partitions):
    """Equal index ranges over n items (reference utils.py:872-887 but
    without the trailing +1 overshoot bug; used only for driver-side
    chunking of small candidate sets — Ray Data owns real partitioning)."""
    import numpy as np
    breaks = np.linspace(0, n, num_partitions + 1, dtype=int)
    return list(zip(breaks[:-1], breaks[1:]))

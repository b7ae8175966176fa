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


def hot_key_audit(ds, col="cell", per_batch_floor=32):
    """Heavy-key audit WITHOUT a key exchange (the salting DECISION
    path): per batch, count keys locally and flag only those with at
    least ``per_batch_floor`` rows in that batch; the tiny flagged
    partials plus per-batch row totals collect to the driver and sum.
    A key hot enough to matter for salting (multiple worker shares)
    crosses the floor in essentially every batch it touches, so its
    driver-summed count is a tight lower bound; cold keys (a handful
    of rows per batch) never surface, so the collected result is
    bounded by the number of genuinely concentrated keys, not key
    cardinality — unlike :func:`cell_counts`, which pays a full
    groupby exchange over every distinct key (~1.5 s of fixed exchange
    latency at bench scale, more than the salting decision saves).
    Returns (hot_counts: dict of lower-bound counts, total_rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.select([col])[col].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(keys, return_counts=True)
        keep = cnts >= per_batch_floor
        return pa.table({
            col: pa.array(np.concatenate([vals[keep], vals[:1]])),
            "n": pa.array(np.concatenate(
                [cnts[keep], np.array([0])]).astype(np.int64)),
            "tot": pa.array(np.concatenate(
                [np.zeros(int(keep.sum()), np.int64),
                 np.array([len(keys)], np.int64)]))})

    rows = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow").take_all()
    hot, total = {}, 0
    for r in rows:
        total += int(r["tot"])
        if int(r["n"]):
            k = r[col]
            hot[k] = hot.get(k, 0) + int(r["n"])
    return hot, total


def memory_bandwidth_probe(mb=128):
    """Effective driver memory-copy bandwidth (GB/s) RIGHT NOW — a
    cheap (~2·mb MB of traffic) probe of the shared DRAM bus. On a
    single box the bus swings from ~2 to ~80 GB/s on minute scales
    (BENCH.md's window regimes), and it is the regime — not the key
    histogram — that decides whether salting a hot composite group
    pays; the probe lets :func:`should_salt` read the regime at
    decision time instead of assuming one."""
    import time
    n = int(mb) * 1024 * 1024 // 8
    src = np.ones(n, dtype=np.float64)
    dst = np.empty_like(src)
    np.copyto(dst, src)                      # warm / page-fault once
    best = 0.0
    for _ in range(3):                       # best-of-3: least-contended
        t0 = time.perf_counter()
        np.copyto(dst, src)
        dt = time.perf_counter() - t0
        best = max(best, (2 * n * 8) / dt / 1e9)
    return best


def should_salt(counts, n_cpus, sub=4, alpha=None, hot_threshold=None,
                bandwidth_gb_s=None, total_rows=None):
    """Cost-model switch for hot-key salting (VERDICT r04 item 6): salt
    only when the predicted hot-group serial time exceeds the plain
    plan's natural floor, instead of whenever any count crosses a fixed
    threshold.

    With per-group work ~ rows, the plain plan's critical path is
    ``max(W_tot/n_cpus, W_max)`` (W_tot = total rows, W_max = hottest
    key): while W_max is within ``alpha`` balanced per-worker shares,
    the hot group hides behind the scan and salting can only add its
    split + finer-shuffle + reassembly taxes. Once one group holds many
    shares, its serial time IS the critical path and splitting divides
    it by sub².

    ``alpha`` (the payback margin in worker shares) is REGIME-DEPENDENT
    on a shared memory bus, so when it is None it is derived from the
    measured copy bandwidth (``bandwidth_gb_s``, probed via
    :func:`memory_bandwidth_probe` when not supplied): at quiet windows
    the distributed scan hides even multi-share hot groups and the
    taxes lose outright (BENCH r4/r5: 4-share hot keys, plain 5.1-5.8 s
    vs salted 6.3-7.2 s), so alpha = 6; at saturated windows
    (single-thread copy < 12 GB/s; one core reads ~18-27 GB/s on a
    quiet bus) the serial hot group collapses with the bus while the
    taxes stay distributed — salting measured 2.8x faster — so
    alpha = 2.

    ``counts`` is the :func:`cell_counts` dict, or the hot-only
    lower-bound dict from :func:`hot_key_audit` with ``total_rows``
    supplying W_tot (the audit's counts omit cold keys). Pass
    ``hot_threshold`` to additionally enforce the caller's absolute
    floor. Returns the list of keys to salt ([] = run the plain
    plan)."""
    if not counts:
        return []
    if alpha is None:
        bw = bandwidth_gb_s if bandwidth_gb_s is not None \
            else memory_bandwidth_probe()
        alpha = 2.0 if bw < 12.0 else 6.0
    tot = total_rows if total_rows is not None else sum(counts.values())
    share = tot / max(int(n_cpus), 1)
    cut = alpha * share
    if hot_threshold is not None:
        cut = max(cut, hot_threshold)
    return [k for k, n in counts.items() if n > cut]


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

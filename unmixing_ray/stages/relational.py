"""Distributed relational operators the Ray Data Dataset API lacks,
each expressed as a combiner-before-shuffle composition (SURVEY.md §2.5
/ §2.6 extension surface; engine-new, no reference analogue — the
reference's tabular work is all whole-frame pandas):

- ``grouped_topk``: top-k rows per key. Per-batch partial top-k bounds
  the shuffle to k rows per (key, batch) before the ``groupby`` merge —
  the exchange never carries more than k·n_batches rows per key no
  matter how large the input.
- ``count_distinct``: exact per-key COUNT(DISTINCT val). Per-batch pair
  dedup is the combiner; the single shuffle carries only the deduped
  (key, val) pairs.
- ``anti_join``: rows of ``left`` with no match in ``right`` — the
  tag-union pattern (no broadcast: both sides may be large). The right
  side is deduped per batch to bare keys, so the shuffle carries left
  rows + right keys, never right payloads.
- ``grouped_quantile_disc``: EXACT per-key discrete quantiles
  (DuckDB/ANSI ``percentile_disc`` semantics: 0-indexed rank
  ceil(n·q)−1) via distributed selection: one sampling pass builds an
  approximate per-key CDF, cheap counting passes narrow a value band
  around each target rank, and only the final O(band) values are ever
  collected — never a per-group sort of the full data. Each refinement
  is a full re-read of the (column-pruned) input, the classic
  distributed-selection tradeoff; typical case is one count + one
  collect pass after sampling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import bounded_blocks


# ---------------------------------------------------------------------------
# grouped top-k

def grouped_topk(ds, keys, order_col, k, descending=True, tiebreak=()):
    """Top-``k`` rows per ``keys`` ordered by ``order_col`` (then
    ``tiebreak`` columns ascending — supply enough columns to make the
    order total, else ties at the k boundary are nondeterministic).
    Adds a 1-based ``rank`` column. Combiner: each batch keeps at most k
    rows per key before the shuffle."""
    if isinstance(keys, str):
        keys = [keys]
    by = list(keys) + [order_col] + list(tiebreak)
    asc = [True] * len(keys) + [not descending] + [True] * len(tiebreak)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=asc).groupby(
            list(keys), sort=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(by, ascending=asc).head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    parts = ds.map_batches(partial, batch_format="pandas")
    return parts.groupby(keys if len(keys) > 1 else keys[0])\
        .map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact COUNT(DISTINCT) per key

def count_distinct(ds, key, val, alias="n_distinct"):
    """Exact per-``key`` count of distinct ``val``. The per-batch pair
    dedup is the combiner; one shuffle of deduped pairs, then a
    vectorized per-group nunique."""

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, val]].drop_duplicates()

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            alias: np.array([g[val].nunique()], dtype=np.int64)})

    return ds.map_batches(dedup, batch_format="pandas")\
        .groupby(key).map_groups(cnt, batch_format="pandas")


# ---------------------------------------------------------------------------
# distributed anti-join (tag-union)

def anti_join(left, right, key, right_key=None):
    """Rows of ``left`` whose ``key`` never appears in ``right``
    (``right_key`` defaults to ``key``). Neither side is broadcast or
    materialized: right batches are deduped to bare keys (combiner),
    tagged, unioned with the tagged left rows, and one ``groupby(key)``
    keeps the groups with no right-tag row. Scale shape: the shuffle
    carries every left row once plus O(distinct right keys)."""
    return _tag_union_filter(left, right, key, right_key, keep_matched=False)


def semi_join(left, right, key, right_key=None):
    """Rows of ``left`` whose ``key`` appears at least once in ``right``
    — distributed EXISTS / IN, the complement of :func:`anti_join` and
    the same tag-union shape: right batches are deduped to bare keys
    (combiner), so the shuffle carries left rows + O(distinct right
    keys) and the right payload never moves. Left multiplicity is
    preserved; right multiplicity never multiplies output rows (unlike
    an inner :func:`hash_join`)."""
    return _tag_union_filter(left, right, key, right_key, keep_matched=True)


def _tag_union_filter(left, right, key, right_key, keep_matched):
    right_key = right_key or key
    schema = left.schema()
    names = list(schema.names)

    def _pa_type(t):
        # Ray schemas are pyarrow-typed for Arrow blocks but carry numpy
        # dtypes for pandas blocks; normalize (object dtype → string)
        if isinstance(t, pa.DataType):
            return t
        dt = np.dtype(t)
        return pa.string() if dt == np.dtype(object) \
            else pa.from_numpy_dtype(dt)

    types = {n: _pa_type(t) for n, t in zip(schema.names, schema.types)}

    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__src", pa.array(np.zeros(t.num_rows, np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ks = pc.unique(t[right_key]).cast(types[key])
        cols = {n: (ks if n == key else pa.nulls(len(ks), types[n]))
                for n in names}
        out = pa.table(cols)
        return out.append_column(
            "__src", pa.array(np.ones(len(ks), np.int8)))

    u = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def keep(g: pa.Table) -> pa.Table:
        src = g["__src"].to_numpy()
        matched = bool((src == 1).any())
        body = g.drop_columns(["__src"])
        if matched != keep_matched:
            return body.slice(0, 0)
        if keep_matched:
            # drop the bare right-key marker rows, keep the left rows
            return body.filter(pa.array(src == 0))
        return body

    return u.groupby(key).map_groups(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact grouped discrete quantiles via distributed selection

def _disc_rank(n, q):
    """0-indexed percentile_disc rank: ceil(n*q) - 1, clamped."""
    import math
    return min(max(int(math.ceil(n * q)) - 1, 0), n - 1)


def _pool_cdfs(lean, key, col, grid):
    """Sampling pass + DISTRIBUTED per-key CDF pooling: per batch per
    key emit count + ``grid`` equi-spaced order statistics, then merge
    each key's batch rows inside a ``groupby`` stage (where the key
    lives — the driver never sees the O(n_batches × keys) sampling
    rows) and downsample the pooled CDF to a fixed ``4·grid+1`` width.
    Index 0 and len-1 are always kept by the linspace downsample, so
    the pooled endpoints remain the key's true min/max and the
    selection refinement's geometric widening converges to a
    guaranteed bracket. Returns the materialized pooled Dataset with
    one compact row per key: (k, n, vals, cum)."""
    pool_grid = 4 * grid + 1

    def sample_batch(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"k": [], "n": [], "pivots": []}
        for kv, g in df.groupby(key, sort=False):
            v = g[col].to_numpy(dtype=np.float64)
            piv = np.quantile(v, np.linspace(0.0, 1.0, grid),
                              method="lower")
            rows["k"].append(kv)
            rows["n"].append(len(v))
            rows["pivots"].append(piv.tolist())
        return pd.DataFrame(rows)

    def pool_group(g: pd.DataFrame) -> pd.DataFrame:
        # every batch pivot carries weight batch_n/grid
        n = int(g["n"].sum())
        vals = np.concatenate([np.asarray(p) for p in g["pivots"]])
        wts = np.concatenate([np.full(grid, bn / grid)
                              for bn in g["n"]])
        order = np.argsort(vals, kind="stable")
        vals, cum = vals[order], np.cumsum(wts[order])
        if len(vals) > pool_grid:
            idx = np.unique(np.round(np.linspace(
                0, len(vals) - 1, pool_grid)).astype(np.int64))
            vals, cum = vals[idx], cum[idx]
        return pd.DataFrame({"k": [g["k"].iloc[0]], "n": [n],
                             "vals": [vals.tolist()],
                             "cum": [cum.tolist()]})

    return lean.map_batches(sample_batch, batch_format="pandas")\
        .groupby("k").map_groups(pool_group, batch_format="pandas")\
        .materialize()


def _grouped_order_stats(ds, key, col, ranks_of_n, grid=65,
                         band_pad=2, max_refine=40, band_cap=2_000_000,
                         max_keys=65_536):
    """Exact per-key order statistics of ``col`` at arbitrary 0-indexed
    ranks (``ranks_of_n(n) -> list[int]`` picks them per key from the
    key's row count) via distributed selection — the shared core of
    ``grouped_quantile_disc`` (percentile_disc ranks) and
    ``grouped_quantile_cont`` (floor/ceil rank pairs + interpolation).

    Passes over the (pruned to key+col) input:
    1. sampling: per batch per key → count + ``grid`` equi-spaced order
       statistics (tiny rows), pooled into a per-key approximate CDF
       INSIDE a ``groupby(key)`` stage (each key's batch pivots merge
       where the key lives, then the pooled CDF is downsampled to a
       fixed ``4·grid+1`` width, endpoints — the true per-key min/max —
       always kept). The driver collects only the compact pooled rows:
       O(keys × grid), never O(n_batches × keys × grid), and the key
       count is loudly capped at ``max_keys`` — the selection core is
       the few-giant-keys design; a high-cardinality key column belongs
       on :func:`grouped_quantile_shuffled` (exact, one shuffle, keys
       never on the driver) or ``approx_quantiles``. The driver then
       brackets every target rank with a [lo, hi] value band padded by
       ``band_pad`` grid steps.
    2. count: per batch per (key, band) → exact n_below(lo) and n_in
       [lo, hi] (tiny rows). If a target rank fell outside its band
       (sampling error) the band is widened from the pooled sample and
       the count pass repeats — at most ``max_refine`` times, in
       practice zero.
    3. collect: band values only (≤ ``band_cap`` rows per key·rank by
       construction of the padded bracket; loud error rather than a
       silent giant collect); driver sorts each band and indexes the
       exact order statistic.
    Returns ``(sorted_keys, n_by_key, values)`` where ``values[kv]`` is
    the list of order statistics in ``ranks_of_n`` order.
    """
    lean = ds.map_batches(
        lambda t: t.select([key, col]), batch_format="pyarrow")
    pooled = _pool_cdfs(lean, key, col, grid)
    n_keys = pooled.count()
    if n_keys > max_keys:
        raise RuntimeError(
            "grouped order statistics (selection core): %d distinct "
            "keys exceeds max_keys=%d — this core holds one compact "
            "pooled CDF per key on the driver and is designed for few "
            "giant keys; route a high-cardinality key column through "
            "grouped_quantile_shuffled (exact, keys never on the "
            "driver) or approx_quantiles" % (n_keys, max_keys))
    parts = pooled.to_pandas()
    info = {}
    for _, r in parts.iterrows():
        n = int(r["n"])
        info[r["k"]] = {"n": n, "vals": np.asarray(r["vals"]),
                        "cum": np.asarray(r["cum"]),
                        "ranks": list(ranks_of_n(n))}

    def bracket(kv, rank, pad):
        st = info[kv]
        j = int(np.searchsorted(st["cum"], rank + 1, side="left"))
        lo = st["vals"][max(0, j - pad)]
        hi = st["vals"][min(len(st["vals"]) - 1, j + pad)]
        return float(lo), float(hi)

    bands = {kv: [bracket(kv, r, band_pad) for r in st["ranks"]]
             for kv, st in info.items()}

    def count_pass(bands_now):
        def cnt(df: pd.DataFrame) -> pd.DataFrame:
            rows = {"k": [], "ri": [], "below": [], "n_in": []}
            for kv, g in df.groupby(key, sort=False):
                if kv not in bands_now:
                    continue
                v = g[col].to_numpy(dtype=np.float64)
                for ri, (lo, hi) in enumerate(bands_now[kv]):
                    rows["k"].append(kv)
                    rows["ri"].append(ri)
                    rows["below"].append(int((v < lo).sum()))
                    rows["n_in"].append(
                        int(((v >= lo) & (v <= hi)).sum()))
            return pd.DataFrame(rows)

        got = lean.map_batches(cnt, batch_format="pandas").to_pandas()
        return got.groupby(["k", "ri"], as_index=False).sum()

    # refinement loop: any band whose exact counts exclude its target
    # rank gets re-bracketed from the pooled sample with a doubled pad —
    # geometric widening converges to the full pooled range (guaranteed
    # bracket) in O(log) cheap counting passes, zero in practice
    pads = {(kv, ri): band_pad for kv in info
            for ri in range(len(info[kv]["ranks"]))}
    for _ in range(max_refine):
        counts = count_pass(bands)
        bad = False
        for _, r in counts.iterrows():
            kv, ri = r["k"], int(r["ri"])
            rank = info[kv]["ranks"][ri]
            idx = rank - int(r["below"])
            if idx < 0 or idx >= int(r["n_in"]):
                bad = True
                pads[(kv, ri)] *= 2
                bands[kv][ri] = bracket(kv, rank, pads[(kv, ri)])
        if not bad:
            break
    else:
        raise RuntimeError("grouped_quantile_disc failed to bracket "
                           "every target rank after %d refinements"
                           % max_refine)
    below = {(r["k"], int(r["ri"])): int(r["below"])
             for _, r in counts.iterrows()}
    n_in = {(r["k"], int(r["ri"])): int(r["n_in"])
            for _, r in counts.iterrows()}
    too_big = [kr for kr, c in n_in.items() if c > band_cap]
    if too_big:
        raise RuntimeError(
            "quantile band exceeds band_cap=%d for %r — raise grid to "
            "narrow the bracket before collecting" % (band_cap, too_big))

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"k": [], "ri": [], "vals": []}
        for kv, g in df.groupby(key, sort=False):
            if kv not in bands:
                continue
            v = g[col].to_numpy(dtype=np.float64)
            for ri, (lo, hi) in enumerate(bands[kv]):
                sel = v[(v >= lo) & (v <= hi)]
                if len(sel):
                    rows["k"].append(kv)
                    rows["ri"].append(ri)
                    rows["vals"].append(sel.tolist())
        return pd.DataFrame(rows)

    got = lean.map_batches(collect, batch_format="pandas").to_pandas()
    keys_sorted = sorted(info)
    values = {}
    for kv in keys_sorted:
        vals_k = []
        for ri in range(len(info[kv]["ranks"])):
            sub = got[(got["k"] == kv) & (got["ri"] == ri)]
            band = np.sort(np.concatenate(
                [np.asarray(v) for v in sub["vals"]]))
            idx = info[kv]["ranks"][ri] - below[(kv, ri)]
            vals_k.append(float(band[idx]))
        values[kv] = vals_k
    n_by_key = {kv: info[kv]["n"] for kv in keys_sorted}
    return keys_sorted, n_by_key, values


def grouped_quantile_disc(ds, key, col, qs=(0.5, 0.9, 0.99), grid=65,
                          band_pad=2, max_refine=40, band_cap=2_000_000,
                          max_keys=65_536):
    """Exact per-key discrete quantiles of ``col`` (the returned values
    are actual data elements, bit-identical to ``quantile_disc``) —
    percentile_disc rank = ceil(n·q)−1 fed to the distributed-selection
    core ``_grouped_order_stats``. Returns a pandas DataFrame: key, one
    ``p<percent>`` column per q."""
    keys_sorted, _n, values = _grouped_order_stats(
        ds, key, col, lambda n: [_disc_rank(n, q) for q in qs],
        grid=grid, band_pad=band_pad, max_refine=max_refine,
        band_cap=band_cap, max_keys=max_keys)
    out = {key: keys_sorted}
    for ri, q in enumerate(qs):
        out["p%g" % (q * 100)] = [values[kv][ri] for kv in keys_sorted]
    return pd.DataFrame(out)


def grouped_quantile_cont(ds, key, col, qs=((1, 2), (9, 10)), grid=65,
                          band_pad=2, max_refine=40,
                          band_cap=2_000_000, max_keys=65_536):
    """Exact per-key INTERPOLATED quantiles (ANSI ``percentile_cont``):
    for rational q = qn/qd the target sits at fractional rank
    (n−1)·q — value = lo + frac·(hi − lo) where lo/hi are the order
    statistics at floor/ceil of that rank. Both order statistics come
    from the same distributed-selection core as the disc variant (the
    floor and ceil ranks are just two entries in the rank list, so the
    extra order statistic costs no extra pass).

    ``qs`` are exact rationals ``(qn, qd)``; the fraction is returned
    as an exact rational (``frac_num = ((n−1)·qn) mod qd`` over
    ``frac_den = qd``) alongside the two float order statistics, so a
    SQL replay can reproduce every column hash-exactly (the convenience
    float interpolation is also returned, for library callers, as
    ``p<percent>``). Returns one row per (key, q): key, qn, qd, n,
    lo, hi, frac_num, frac_den, p<...> columns wide by q would force
    float compare — long form keeps the oracle exact."""

    def ranks_of_n(n):
        ranks = []
        for qn, qd in qs:
            r = (n - 1) * qn
            ranks.append(r // qd)          # floor rank
            ranks.append(min(n - 1, r // qd + (1 if r % qd else 0)))
        return ranks

    keys_sorted, n_by_key, values = _grouped_order_stats(
        ds, key, col, ranks_of_n, grid=grid, band_pad=band_pad,
        max_refine=max_refine, band_cap=band_cap, max_keys=max_keys)
    rows = {key: [], "qn": [], "qd": [], "n": [], "lo": [], "hi": [],
            "frac_num": [], "frac_den": [], "interp": []}
    for kv in keys_sorted:
        n = n_by_key[kv]
        for qi, (qn, qd) in enumerate(qs):
            lo, hi = values[kv][2 * qi], values[kv][2 * qi + 1]
            fn_, fd = ((n - 1) * qn) % qd, qd
            rows[key].append(kv)
            rows["qn"].append(qn)
            rows["qd"].append(qd)
            rows["n"].append(n)
            rows["lo"].append(lo)
            rows["hi"].append(hi)
            rows["frac_num"].append(fn_)
            rows["frac_den"].append(fd)
            rows["interp"].append(lo + (fn_ / fd) * (hi - lo))
    df = pd.DataFrame(rows)
    for c in ("qn", "qd", "n", "frac_num", "frac_den"):
        df[c] = df[c].astype("int64")
    return df


def grouped_quantile_shuffled(ds, key, col, qs=(0.5, 0.9, 0.99)):
    """EXACT per-key discrete quantiles for HIGH-cardinality key
    columns: ONE hash shuffle (``groupby(key)``), then each group sorts
    its own values where the key lives — the driver never holds keys,
    values, or CDFs (returns a Dataset; consume with write_parquet or a
    downstream stage). percentile_disc semantics identical to
    :func:`grouped_quantile_disc`.

    The two exact strategies partition the cardinality space:
    - many keys, each group fits a block → THIS (a billion distinct
      keys is fine: per-group state is the group itself, post-shuffle);
    - few giant keys (a group exceeds block memory) → the selection
      core (:func:`grouped_quantile_disc`), which never materializes a
      full group anywhere and holds one compact CDF per key on the
      driver (loudly capped at ``max_keys``)."""

    def one(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[col].to_numpy(np.float64))
        n = len(v)
        row = {key: [g[key].iloc[0]]}
        for q in qs:
            row["p%g" % (q * 100)] = [float(v[_disc_rank(n, q)])]
        return pd.DataFrame(row)

    return ds.select_columns([key, col]).groupby(key).map_groups(
        one, batch_format="pandas")


def referential_audit(checks):
    """Data-quality audit: for each (label, fact, fk, dim, pk) check,
    count fact rows whose foreign key has no match in the dimension —
    the orphan/dangling-reference scan every warehouse load runs.
    ``checks`` is a list of those 5-tuples; returns one row per check
    (relation, n_rows, n_orphans).

    Scale shape: each check is ONE tag-union anti-join (both sides
    stay distributed — the dimension ships only deduped keys per
    batch, the fact only its fk column) plus two counts; no broadcast,
    no driver materialization beyond the per-check scalars."""
    rows = {"relation": [], "n_rows": [], "n_orphans": []}
    for label, fact, fk, dim, pk in checks:
        fcol = fact.select_columns([fk])
        n = fcol.count()
        orph = anti_join(fcol, dim.select_columns([pk]), fk,
                         right_key=pk).count()
        rows["relation"].append(label)
        rows["n_rows"].append(n)
        rows["n_orphans"].append(orph)
    out = pd.DataFrame(rows)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_orphans"] = out["n_orphans"].astype("int64")
    return out


def grouped_mad(ds, key, col, scale=100):
    """Per-key robust dispersion: median and MAD (median absolute
    deviation) of ``col``, both in exact fixed-point (round(col·scale)
    → int64, so the order statistics are integers and the SQL replay
    is hash-exact). percentile_disc semantics throughout — the classic
    robust-z-score / outlier-gate ingredients where mean/std
    (grouped_moments) are skew-fragile.

    Scale shape: two runs of the distributed-selection core
    (:func:`_grouped_order_stats` via grouped_quantile_disc) — never a
    per-group sort of the full column. The per-key median table lives
    on the driver between the passes (one row per key — the same
    driver contract as grouped_quantile_disc) and is rebroadcast into
    the deviation pass as a closure dict; a key space too large for
    that would attach medians with the partitioned hash_join instead.

    Returns a pandas DataFrame: key, median (int64, scaled), mad
    (int64, scaled)."""

    def fixed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: df[key].to_numpy().astype(np.int64),
            "_v": np.rint(df[col].to_numpy(np.float64) * scale)
            .astype(np.int64)})

    vds = ds.select_columns([key, col]).map_batches(
        fixed, batch_format="pandas").materialize()
    med = grouped_quantile_disc(vds, key, "_v", qs=(0.5,))
    med_map = dict(zip(med[key].astype(np.int64),
                       med["p50"].astype(np.int64)))

    def dev(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key].to_numpy(np.int64)
        m = pd.Series(k).map(med_map).to_numpy(np.int64)
        return pd.DataFrame({
            key: k, "_v": np.abs(df["_v"].to_numpy(np.int64) - m)})

    mad = grouped_quantile_disc(vds.map_batches(dev,
                                                batch_format="pandas"),
                                key, "_v", qs=(0.5,))
    out = med.rename(columns={"p50": "median"}).merge(
        mad.rename(columns={"p50": "mad"}), on=key)
    out[key] = out[key].astype("int64")
    out["median"] = out["median"].astype("int64")
    out["mad"] = out["mad"].astype("int64")
    return out


def grouped_mad_sql(table, key, col, scale=100):
    """DuckDB replay: percentile_disc medians of the same fixed-point
    values and deviations."""
    return f"""
        WITH v AS (
          SELECT {key} AS k,
                 CAST(round({col} * {scale}) AS BIGINT) AS v
          FROM {table}),
        m AS (SELECT k, percentile_disc(0.5) WITHIN GROUP (ORDER BY v)
                       AS med
              FROM v GROUP BY k),
        d AS (SELECT v.k, m.med, abs(v.v - m.med) AS dev
              FROM v JOIN m ON v.k = m.k)
        SELECT CAST(k AS BIGINT) AS {key},
               CAST(min(med) AS BIGINT) AS median,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)
                    AS BIGINT) AS mad
        FROM d GROUP BY k"""


# ---------------------------------------------------------------------------
# deterministic sampling (hash-threshold Bernoulli / per-key top-n)

def _md5_hex8(series, seed):
    import hashlib
    return np.array([hashlib.md5(("%s:%d" % (v, seed)).encode())
                     .hexdigest()[:8] for v in series])


def bernoulli_sample(ds, id_col, rate, seed=0):
    """Deterministic Bernoulli sample: keep a row iff the first 8 hex
    chars of md5("<id>:<seed>") fall below rate·2³². Stateless one-pass
    filter — reproducible across runs, partitionings and engines (the
    same predicate is expressible in SQL, which is the oracle), and
    composable: different seeds give independent samples."""
    thresh = "%08x" % int(rate * (1 << 32))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df[_md5_hex8(df[id_col], seed) < thresh]

    return ds.map_batches(fn, batch_format="pandas")


def bernoulli_sample_sql_pred(id_expr, rate, seed=0):
    """The matching DuckDB predicate (md5 hex compares lexicographically
    because digests are fixed-width lowercase hex)."""
    thresh = "%08x" % int(rate * (1 << 32))
    return ("substr(md5(CAST(%s AS VARCHAR) || ':%d'), 1, 8) < '%s'"
            % (id_expr, seed, thresh))


def stratified_sample(ds, key, id_col, n, seed=0):
    """Exactly-n-per-key uniform sample without replacement: rank rows
    within each key by md5("<id>:<seed>") and keep the n smallest —
    deterministic, engine-independent, and it reuses grouped_topk's
    combiner so each batch ships at most n rows per key."""

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["h"] = _md5_hex8(df[id_col], seed)
        return out

    return grouped_topk(ds.map_batches(add_h, batch_format="pandas"),
                        key, "h", n, descending=False,
                        tiebreak=(id_col,))


# ---------------------------------------------------------------------------
# HyperLogLog approximate COUNT(DISTINCT) — the scale path of
# count_distinct: register sketches merge associatively, so the shuffle
# carries one 2^b-byte sketch per (key, batch) instead of the deduped
# pairs, and the answer costs O(keys · 2^b) memory at any cardinality.

def _hll_registers(vals, b):
    import hashlib
    m = 1 << b
    reg = np.zeros(m, dtype=np.uint8)
    for v in vals:
        h = int.from_bytes(
            hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
            "big")
        j = h >> (64 - b)
        w = h & ((1 << (64 - b)) - 1)
        rho = (64 - b) - w.bit_length() + 1
        if rho > reg[j]:
            reg[j] = rho
    return reg


def _hll_estimate(reg):
    m = float(len(reg))
    est = 0.7213 / (1 + 1.079 / m) * m * m / \
        np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:          # small-range correction
        est = m * np.log(m / zeros)
    return est


def approx_count_distinct(ds, key, val, b=12, alias="approx_distinct"):
    """Per-key HyperLogLog distinct estimate (±~1.04/sqrt(2^b), ~1.6%
    at the default b=12). Per-batch register sketches are the combiner;
    the groupby merge is an elementwise max of registers."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"k": [], "reg": []}
        for kv, g in df.groupby(key, sort=False):
            rows["k"].append(kv)
            rows["reg"].append(
                _hll_registers(g[val].to_numpy(), b).tobytes())
        out = pd.DataFrame(rows)
        return out.rename(columns={"k": key})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack([np.frombuffer(r, dtype=np.uint8)
                         for r in g["reg"]])
        est = _hll_estimate(regs.max(axis=0))
        return pd.DataFrame({key: [g[key].iloc[0]],
                             alias: np.array([int(round(est))],
                                             dtype=np.int64)})

    return ds.map_batches(sketch, batch_format="pandas")\
        .groupby(key).map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# grouping sets (ROLLUP)

ROLLUP_ALL = "__ALL__"


def rollup_sums(ds, keys, val, scale=100, marker=ROLLUP_ALL):
    """GROUP BY ROLLUP(*keys): exact scaled-integer sum + count of
    ``val`` for every rollup prefix of ``keys`` (…, (k1, k2), (k1,),
    ()), in ONE shuffle. Rolled-up key positions carry ``marker``
    (the data must not contain it — asserted per batch).

    Combiner: each batch pre-aggregates ALL grouping sets locally, so
    the exchange carries at most sum_over_prefixes(|groups|) rows per
    batch no matter the input size; the final per-key merge is a sum.
    """
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.rint(df[val].to_numpy() * scale).astype(np.int64)
        work = df[keys].copy()
        for k in keys:
            if (work[k] == marker).any():
                raise ValueError("rollup marker collides with data")
        work["__v"] = v
        outs = []
        for plen in range(len(keys), -1, -1):
            gcols = keys[:plen]
            if gcols:
                agg = work.groupby(gcols, as_index=False).agg(
                    sum_c=("__v", "sum"), n=("__v", "size"))
            else:
                agg = pd.DataFrame({"sum_c": [int(v.sum())],
                                    "n": [len(v)]})
            for k in keys[plen:]:
                agg[k] = marker
            outs.append(agg[keys + ["sum_c", "n"]])
        out = pd.concat(outs, ignore_index=True)
        out["sum_c"] = out["sum_c"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[:1][keys].copy().reset_index(drop=True)
        out["sum_c"] = np.int64(g["sum_c"].sum())
        out["n"] = np.int64(g["n"].sum())
        return out

    parts = ds.select_columns(keys + [val]).map_batches(
        partial, batch_format="pandas")
    return parts.groupby(keys).map_groups(merge, batch_format="pandas")


def rollup_sums_sql(table, keys, val, scale=100, marker=ROLLUP_ALL):
    """DuckDB oracle for :func:`rollup_sums` (no NULLs in the key
    columns assumed, so COALESCE marks exactly the rolled positions)."""
    if isinstance(keys, str):
        keys = [keys]
    sel = ",\n               ".join(
        f"coalesce({k}, '{marker}') AS {k}" for k in keys)
    return f"""
        SELECT {sel},
               CAST(sum(CAST(round({val} * {scale}) AS BIGINT))
                    AS BIGINT) AS sum_c,
               CAST(count(*) AS BIGINT) AS n
        FROM {table}
        GROUP BY ROLLUP ({", ".join(keys)})"""


def pivot_count(ds, key, pivot_col, categories, total_alias="n_total"):
    """Pivot/crosstab: one output row per ``key`` with a count column
    per ``pivot_col`` category (plus a total), i.e. long → wide.

    Ray Data has no native pivot; this is the canonical distributed
    shape: each batch pre-aggregates its own crosstab (vectorized
    ``pd.crosstab``), so the single ``groupby(key)`` exchange moves one
    row per (key, batch) of fixed-width int64 counts — never the input
    rows. ``categories`` must be the closed category list (explicit so
    the output schema is deterministic; unseen categories yield zero
    columns, unexpected values raise loudly rather than silently
    widening the schema).
    """
    from ray.data.aggregate import Sum

    cats = list(categories)
    cols = [f"n_{c}" for c in cats]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        extra = set(df[pivot_col].unique()) - set(cats)
        if extra:
            raise ValueError(
                f"pivot_count: values {sorted(extra)!r} not in the "
                f"declared categories {cats!r}")
        ct = pd.crosstab(df[key], df[pivot_col])
        ct = ct.reindex(columns=cats, fill_value=0).astype("int64")
        ct.columns = cols
        out = ct.reset_index().rename(columns={ct.index.name or key: key})
        return out

    return ds.select_columns([key, pivot_col]).map_batches(
        partial, batch_format="pandas").groupby(key).aggregate(
        *[Sum(c, alias_name=c) for c in cols]).map_batches(
        lambda df: df.assign(
            **{c: df[c].astype("int64") for c in cols},
            **{total_alias: df[cols].sum(axis=1).astype("int64")}),
        batch_format="pandas")


def pivot_count_sql(table, key, pivot_col, categories,
                    total_alias="n_total"):
    """DuckDB oracle for :func:`pivot_count` (conditional aggregation —
    column names must match the engine's exactly for the value-hash)."""
    cats = list(categories)
    conds = ",\n               ".join(
        f"CAST(sum(CASE WHEN {pivot_col} = '{c}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{c}" for c in cats)
    return f"""
        SELECT {key},
               {conds},
               CAST(count(*) AS BIGINT) AS {total_alias}
        FROM {table}
        GROUP BY {key}"""


def _bloom_positions(vals, bits):
    """Two deterministic bit positions per value (double hashing over
    the 64-bit siphash pandas uses with its fixed default key — stable
    across processes and nodes, so build and probe agree)."""
    h = pd.util.hash_pandas_object(
        pd.Series(vals), index=False).to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        h2 = h * np.uint64(0x9E3779B97F4A7C15)
    return h % np.uint64(bits), h2 % np.uint64(bits)


def bloom_from_dataset(ds, key, bits=1 << 23):
    """One column-pruned pass over ``ds`` building a Bloom filter of its
    ``key`` values as a packed uint64 bitmap (``bits`` must be a power
    of two; default 1 MiB). Per-block bitmaps are OR-merged pairwise by
    Ray's aggregate tree — the driver only ever sees the final bitmap."""
    from ray.data.aggregate import AggregateFn

    words = bits // 64

    def acc(state, block):
        i1, i2 = _bloom_positions(block[key], bits)
        for i in (i1, i2):
            np.bitwise_or.at(state, (i >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (i & np.uint64(63)))
        return state

    agg = AggregateFn(
        init=lambda k: np.zeros(words, np.uint64),
        merge=lambda a, b: a | b,
        accumulate_block=acc,
        name="bloom")
    return ds.select_columns([key]).aggregate(agg)["bloom"]


def bloom_contains(bitmap, vals, bits=None):
    """Vectorized membership probe (no false negatives)."""
    bits = bits or len(bitmap) * 64
    i1, i2 = _bloom_positions(vals, bits)
    hit = np.ones(len(i1), bool)
    for i in (i1, i2):
        hit &= ((bitmap[(i >> np.uint64(6)).astype(np.int64)]
                 >> (i & np.uint64(63))) & np.uint64(1)).astype(bool)
    return hit


def hash_join(left, right, key, how="inner", bloom_prune=None,
              bloom_bits=1 << 23, left_cols=None, right_cols=None):
    """Distributed equi-join with BOTH sides large: the canonical
    partitioned hash join. Each side's rows are tagged and unioned, the
    single ``groupby(key)`` exchange co-locates matching keys, and each
    group merges its two sides with a vectorized ``pd.merge`` (exact
    multiplicity semantics: |L_k| × |R_k| output rows per key).

    Scale shape: both inputs shuffle ONCE by key hash — use
    broadcast-small-side (see q_customer_orders) when one side fits in
    object-store memory, and pre-aggregate before joining when the
    downstream is an aggregate anyway. Hot keys skew the exchange: salt
    them upstream (stages/shuffle.py) if |L_k| × |R_k| of one key
    dominates. ``how`` supports "inner", "left", "right" and "outer"
    (full outer): unmatched preserved-side rows carry nulls in the
    other side's columns — per-key groups contain every row of either
    side for that key, so the within-group merge realizes the global
    outer semantics exactly.

    ``bloom_prune`` ("left" or "right") drops that side's no-match rows
    BEFORE they enter the shuffle, via a Bloom filter of the other
    side's keys (one extra column-pruned pass over the build side, a
    fixed ``bloom_bits``-bit bitmap broadcast once with ``ray.put``).
    No false negatives, so the join result is identical; false
    positives only cost shuffle bytes. Worth it when the pruned side is
    much larger than its matching subset (selective filters on the
    build side). A left join must keep every left row, so only
    ``bloom_prune="right"`` is legal there.
    """
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError("hash_join: how must be inner/left/right/outer")
    if bloom_prune not in (None, "left", "right"):
        raise ValueError("hash_join: bloom_prune must be left/right")
    preserved = {"left": ("left",), "right": ("right",),
                 "outer": ("left", "right")}.get(how, ())
    if bloom_prune in preserved:
        raise ValueError("hash_join: cannot bloom-prune the preserved "
                         "side of a %s join" % how)
    if bloom_prune:
        import ray
        build = right if bloom_prune == "left" else left
        bm_ref = ray.put(bloom_from_dataset(build, key, bloom_bits))

        def prune(df: pd.DataFrame) -> pd.DataFrame:
            return df[bloom_contains(ray.get(bm_ref), df[key], bloom_bits)]

        if bloom_prune == "left":
            left = left.map_batches(prune, batch_format="pandas")
        else:
            right = right.map_batches(prune, batch_format="pandas")
    # Ray cannot infer a schema through union + all-to-all chains (a
    # hash_join-of-hash_join returns schema()=None even with
    # fetch_if_missing); callers composing joins pass the non-key
    # column lists explicitly.
    lcols = [c for c in (left_cols if left_cols is not None else
                         left.schema(fetch_if_missing=True).names)
             if c != key]
    rcols = [c for c in (right_cols if right_cols is not None else
                         right.schema(fetch_if_missing=True).names)
             if c != key]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(
            f"hash_join: non-key columns {sorted(overlap)!r} exist on "
            "both sides; rename before joining")
    all_cols = [key, "_side"] + lcols + rcols

    def tag(side, own):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({key: df[key], "_side": np.int8(side)})
            for c in own:
                out[c] = df[c]
            for c in all_cols:
                if c not in out.columns:
                    out[c] = None
            return out[all_cols]
        return fn

    tagged = left.map_batches(tag(0, lcols), batch_format="pandas") \
        .union(right.map_batches(tag(1, rcols), batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0][[key] + lcols]
        r = g[g["_side"] == 1][[key] + rcols]
        return l.merge(r, on=key, how=how)

    return tagged.groupby(key).map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact global top-k heavy hitters via a Misra-Gries sketch pass + a
# candidate-restricted exact counting pass.
#
# The exact path (bigram_topk-style per-batch count combiner) shuffles
# one row per (batch, distinct key) — at web scale the distinct-key
# universe (tokens, URLs, hosts) can be billions, so that exchange is
# the bottleneck. Here pass 1 ships at most `capacity` rows per batch
# (the Misra-Gries summary: per-key LOWER bounds plus the batch's
# decrement total d_b, whose global sum D bounds every undercount —
# Agarwal et al., "Mergeable Summaries", PODS 2012); pass 2 exact-counts
# ONLY the top-C candidate keys (broadcast via ray.put). The result is
# PROVABLY exact when kth_exact_count > lb_C + D (no unseen or
# non-candidate key can reach — or lexicographically steal — rank k);
# otherwise we fall back loudly to the exact full-shuffle path, so the
# answer is exact either way and the sketch is purely a bandwidth
# optimization.

def heavy_hitters(ds, col=None, k=20, capacity=None, counter_fn=None,
                  candidates=None, key_name=None, alias="n_total",
                  _force_no_fallback=False):
    """Exact global top-``k`` most frequent items with counts.

    Items come from column ``col``, or from ``counter_fn(df) ->
    dict[item, count]`` for derived items (e.g. tokenized text).
    ``capacity`` is the Misra-Gries summary size per batch (default
    64·k); ``candidates`` the verified candidate pool size C (default
    max(4k, 64)). Ties break (count desc, item asc) — same total order
    as the SQL oracle."""
    import warnings

    from ray.data.aggregate import Sum

    if (col is None) == (counter_fn is None):
        raise ValueError("heavy_hitters: pass exactly one of col / "
                         "counter_fn")
    key_name = key_name or (col if col is not None else "item")
    m = int(capacity or 64 * k)
    C = int(candidates or max(4 * k, 64))

    def _counts(df):
        if counter_fn is not None:
            return counter_fn(df)
        v, c = np.unique(df[col].to_numpy(), return_counts=True)
        return dict(zip(v.tolist(), c.tolist()))

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        c = _counts(df)
        items = np.array(list(c.keys()))
        n = np.fromiter(c.values(), np.int64, len(c))
        d = 0
        if len(n) > m:
            # Misra-Gries truncation of the exact batch counts: subtract
            # the (m+1)-th largest count from all, keep the positives.
            d = int(np.partition(n, len(n) - (m + 1))[len(n) - (m + 1)])
            keep = n > d
            items, n = items[keep], n[keep] - d
        out = pd.DataFrame({key_name: items.astype(str),
                            "n": n, "kind": np.int8(0)})
        sent = pd.DataFrame({key_name: [""], "n": np.array([d], np.int64),
                             "kind": np.array([1], np.int8)})
        return pd.concat([out, sent], ignore_index=True)

    src = ds if counter_fn is not None else ds.select_columns([col])
    merged = src.map_batches(sketch, batch_format="pandas")\
        .groupby(["kind", key_name])\
        .aggregate(Sum("n", alias_name="n"))

    # D and the top-C candidate lower bounds are tiny driver-side tables
    dd = merged.filter(expr="kind == 1").to_pandas()
    D = int(dd["n"].sum()) if "n" in dd.columns else 0
    cand = merged.filter(expr="kind == 0")\
        .sort(["n", key_name], descending=[True, False])\
        .limit(C).to_pandas()
    if len(cand) == 0 or key_name not in cand.columns:
        # every batch's summary truncated to nothing (near-uniform data)
        cand = pd.DataFrame({key_name: [], "n": []})
    # lb_C bounds every NON-candidate sketched key; if the sketch pass
    # produced fewer than C distinct keys there are none, so only the
    # never-sketched bound D applies.
    lb_C = int(cand["n"].iloc[-1]) if len(cand) >= C else 0
    cand_keys = cand[key_name].tolist()

    exact, kth = None, None
    if len(cand_keys) >= k:
        import ray
        ref = ray.put(set(cand_keys))

        def exact_pass(df: pd.DataFrame) -> pd.DataFrame:
            want = ray.get(ref)
            c = _counts(df)
            kept = {kk: vv for kk, vv in c.items() if str(kk) in want}
            return pd.DataFrame({
                key_name: np.array(list(kept.keys()), dtype=str),
                "n": np.fromiter(kept.values(), np.int64, len(kept))})

        exact = src.map_batches(exact_pass, batch_format="pandas")\
            .groupby(key_name).aggregate(Sum("n", alias_name=alias))\
            .sort([alias, key_name], descending=[True, False])\
            .limit(k).to_pandas()
        kth = int(exact[alias].iloc[-1]) if len(exact) >= k else -1
        if kth > lb_C + D:
            exact[alias] = exact[alias].astype("int64")
            return exact

    if _force_no_fallback:
        raise AssertionError(
            "heavy_hitters: exactness proof failed (kth=%s, lb_C=%d, "
            "D=%d) and fallback disabled" % (kth, lb_C, D))
    warnings.warn(
        "heavy_hitters: sketch could not prove exactness "
        "(lb_C=%d, D=%d); falling back to the full exact shuffle"
        % (lb_C, D))

    def full(df: pd.DataFrame) -> pd.DataFrame:
        c = _counts(df)
        return pd.DataFrame({
            key_name: np.array(list(c.keys()), dtype=str),
            "n": np.fromiter(c.values(), np.int64, len(c))})

    out = src.map_batches(full, batch_format="pandas")\
        .groupby(key_name).aggregate(Sum("n", alias_name=alias))\
        .sort([alias, key_name], descending=[True, False])\
        .limit(k).to_pandas()
    out[alias] = out[alias].astype("int64")
    return out


def heavy_hitters_tokens_sql(k=20):
    """DuckDB oracle for token heavy hitters over ``documents`` (same
    [a-z0-9]+ tokenizer as :func:`unmixing_ray.stages.text.bigram_topk`)."""
    return f"""
        WITH toks AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
            AS token
          FROM documents)
        SELECT token, CAST(count(*) AS BIGINT) AS n_total
        FROM toks GROUP BY token
        ORDER BY n_total DESC, token LIMIT {k}"""


def split_assign(ds, id_col, val_rate=0.05, test_rate=0.05, seed=0):
    """Deterministic train/val/test split assignment — the
    leakage-proof dataset-split primitive of a training pipeline: a
    row's split is a pure function of its id (first 8 hex chars of
    md5("<id>:<seed>") against fixed thresholds), so the assignment is
    reproducible across runs, partitionings, engines AND corpus
    growth — adding rows never moves an existing row between splits
    (the property a random_shuffle-based split lacks). Stateless
    one-pass map; the same predicate is the SQL oracle."""
    t_val = "%08x" % int(val_rate * (1 << 32))
    t_test = "%08x" % int((val_rate + test_rate) * (1 << 32))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5_hex8(df[id_col], seed)
        split = np.where(h < t_val, "val",
                         np.where(h < t_test, "test", "train"))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "split": split})

    return ds.map_batches(fn, batch_format="pandas")


def split_assign_sql(id_expr, val_rate=0.05, test_rate=0.05, seed=0):
    """The matching DuckDB CASE expression."""
    t_val = "%08x" % int(val_rate * (1 << 32))
    t_test = "%08x" % int((val_rate + test_rate) * (1 << 32))
    h = "substr(md5(CAST(%s AS VARCHAR) || ':%d'), 1, 8)" % (id_expr,
                                                             seed)
    return ("CASE WHEN %s < '%s' THEN 'val' "
            "WHEN %s < '%s' THEN 'test' ELSE 'train' END"
            % (h, t_val, h, t_test))


MIX_SOURCES = (("web", 60), ("books", 30), ("code", 10))


def corpus_mix(ds, id_col, weights=MIX_SOURCES, target_frac_u6=500_000,
               n_parts=64, seed=0, source_rates=(0.6, 0.9)):
    """Deterministic source-weighted corpus mixing — the data-mixing
    step of LLM training pipelines: given per-source target weights
    and a total budget, keep the FIRST ``quota_s`` docs of each source
    in id order (quota_s = min(n_s, T·w_s // Σw with
    T = total·target_frac_u6 // 10⁶) — exact integer arithmetic so the
    SQL replay is hash-identical). Source labels here are the
    engine's deterministic md5-range tag (a stand-in for a real
    domain column; the mixing machinery is label-agnostic).

    Returns (doc_id, source, src_rank, kept) for EVERY row —
    ``src_rank`` is the exact per-source row_number (0-based, id
    order), the distributed primitive this operator adds: computed
    WITHOUT a per-source shuffle via the pack_chunks range-bucket
    discipline (bucket = id // span, per-(bucket, source) count
    partials → a P×S driver prefix table — bounded by bucket count ×
    SOURCE CARDINALITY, documented small — → per-bucket local sort +
    cumcount under broadcast bases). One groupby(bucket) is the only
    exchange; text never moves.
    """
    # generic K-way tagging (ADVICE r04): the K source names map onto
    # the K md5-range buckets cut at the K-1 ``source_rates``
    # thresholds; a mismatched pair would silently distort the mix
    # (unassigned names still diluting the quota denominator), so it
    # refuses instead
    if len(weights) != len(source_rates) + 1:
        raise ValueError(
            "corpus_mix: %d weights need exactly %d source_rates "
            "thresholds (got %d) — one md5-range bucket per source"
            % (len(weights), len(weights) - 1, len(source_rates)))
    if list(source_rates) != sorted(source_rates):
        raise ValueError("corpus_mix: source_rates must be ascending")
    bounds = np.array(["%08x" % int(r * (1 << 32))
                       for r in source_rates])
    names = [w[0] for w in weights]
    names_arr = np.array(names, dtype=object)
    wsum = sum(w[1] for w in weights)
    wmap = dict(weights)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5_hex8(df[id_col], seed)
        src = names_arr[np.searchsorted(bounds, np.asarray(h),
                                        side="right")]
        return pd.DataFrame({"doc_id": df[id_col].astype("int64"),
                             "source": src})

    tagged = ds.map_batches(tag, batch_format="pandas").materialize()
    hi = tagged.max("doc_id")
    if hi is None:
        import pyarrow as pa
        import ray.data
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "src_rank": pa.array([], pa.int64()),
            "kept": pa.array([], pa.int64())}))
    span = max(1, (int(hi) + int(n_parts)) // int(n_parts))

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (df["doc_id"] // span).astype("int64")
        return df

    parted = tagged.map_batches(add_part, batch_format="pandas")

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["part", "source"], as_index=False).size()
        return pd.DataFrame({"part": g["part"].astype("int64"),
                             "source": g["source"],
                             "n": g["size"].astype("int64")})

    from ray.data.aggregate import Sum
    counts = parted.map_batches(count_partial, batch_format="pandas")\
        .groupby(["part", "source"]).aggregate(
        Sum("n", alias_name="n")).to_pandas()
    counts = counts.sort_values(["source", "part"])
    # exclusive per-source prefix over bucket order -> rank base per
    # (bucket, source); plus per-source totals -> integer quotas
    base = {}
    totals = {}
    for src, g in counts.groupby("source"):
        run = 0
        for _i, row in g.iterrows():
            base[(int(row["part"]), src)] = run
            run += int(row["n"])
        totals[src] = run
    total = sum(totals.values())
    T = total * int(target_frac_u6) // 1_000_000
    quota = {s: min(totals.get(s, 0), T * wmap[s] // wsum)
             for s in names}

    def place(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        p = int(g["part"].iloc[0])
        rank = np.empty(len(g), dtype=np.int64)
        for src, idx in g.groupby("source").groups.items():
            ix = np.asarray(idx, dtype=np.int64)
            rank[ix] = base[(p, src)] + np.arange(len(ix),
                                                  dtype=np.int64)
        q = g["source"].map(quota).to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "source": g["source"],
            "src_rank": pd.Series(rank, dtype="int64"),
            "kept": pd.Series((rank < q).astype(np.int64),
                              dtype="int64")})

    return parted.groupby("part").map_groups(place,
                                             batch_format="pandas")


def corpus_mix_sql(id_expr="doc_id", table="documents",
                   weights=MIX_SOURCES, target_frac_u6=500_000,
                   seed=0, source_rates=(0.6, 0.9)):
    """DuckDB replay of :func:`corpus_mix` — md5-range tag, per-source
    row_number, identical integer quota arithmetic."""
    t1 = "%08x" % int(source_rates[0] * (1 << 32))
    t2 = "%08x" % int(source_rates[1] * (1 << 32))
    names = [w[0] for w in weights]
    wsum = sum(w[1] for w in weights)
    vals = ", ".join("('%s', %d)" % w for w in weights)
    h = ("substr(md5(CAST(%s AS VARCHAR) || ':%d'), 1, 8)"
         % (id_expr, seed))
    return f"""
        WITH t AS (
          SELECT {id_expr} AS doc_id,
                 CASE WHEN {h} < '{t1}' THEN '{names[0]}'
                      WHEN {h} < '{t2}' THEN '{names[1]}'
                      ELSE '{names[2]}' END AS source
          FROM {table}),
        r AS (
          SELECT doc_id, source,
                 CAST(row_number() OVER (PARTITION BY source
                      ORDER BY doc_id) - 1 AS BIGINT) AS src_rank
          FROM t),
        c AS (SELECT source, count(*) AS n FROM t GROUP BY source),
        q AS (
          SELECT c.source,
                 least(c.n,
                       (SELECT count(*) FROM t) * {int(target_frac_u6)}
                       // 1000000 * w.wt // {wsum}) AS quota
          FROM c JOIN (VALUES {vals}) AS w(source, wt)
            ON w.source = c.source)
        SELECT r.doc_id, r.source, r.src_rank,
               CAST(CASE WHEN r.src_rank < q.quota THEN 1 ELSE 0 END
                 AS BIGINT) AS kept
        FROM r JOIN q ON q.source = r.source"""


def approx_quantiles(ds, col, qs=(0.25, 0.5, 0.75, 0.95),
                     sample_size=4096, id_col=None, seed=0):
    """Approximate quantiles via a deterministic BOTTOM-m hash sketch —
    the mergeable scale path of :func:`grouped_quantiles` (which is
    exact but needs counting passes): every row gets the rank
    md5("<id>:<seed>"), each batch keeps its ``sample_size`` smallest
    ranks (the combiner), and the global bottom-``sample_size`` set —
    an exact uniform sample WITHOUT replacement, identical at any
    partitioning because the ranks are a pure function of row identity
    — is reduced by a distributed sort+limit. Driver work = m rows;
    percentile-rank error is O(1/sqrt(m)) (pytest-pinned vs the exact
    operator). ``id_col`` defaults to ``col`` (dedup-by-value ranks;
    pass a real id column for multiset semantics)."""
    idc = id_col or col

    def bottom_m(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "h": _md5_hex8(df[idc], seed),
            "v": df[col].to_numpy()})
        # hex strings sort lexicographically == numerically (fixed
        # width); nsmallest rejects object dtype, so sort+head
        return out.sort_values("h", kind="mergesort")\
            .head(sample_size)

    rows = ds.map_batches(bottom_m, batch_format="pandas") \
        .sort("h").limit(sample_size).take_all()
    vals = np.sort(np.array([r["v"] for r in rows]))
    if not len(vals):
        return pd.DataFrame({"q": [], "value": []})
    idx = np.minimum((np.asarray(qs) * len(vals)).astype(np.int64),
                     len(vals) - 1)
    return pd.DataFrame({"q": list(qs), "value": vals[idx]})


def value_histogram(ds, col, lo, hi, bins=32):
    """Equi-width histogram of a numeric column — the ANALYZE/profiling
    primitive: per-batch bincount partials (one row per non-empty bin
    per batch through the shuffle, never a row per value), merged by a
    tiny groupby. Bin rule matches SQL: values clipped into [lo, hi],
    ``bin = floor((v - lo) * bins / (hi - lo + 1))`` in exact integer
    arithmetic for integer columns."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.clip(df[col].to_numpy().astype(np.int64), lo, hi)
        b = (v - lo) * bins // (hi - lo + 1)
        h = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(h)
        return pd.DataFrame({
            "bin": pd.Series(nz, dtype="int64"),
            "n": pd.Series(h[nz], dtype="int64")})

    merged = ds.map_batches(partial, batch_format="pandas") \
        .groupby("bin").sum("n")

    def rename(batch):
        import pyarrow as pa
        return pa.table({
            "bin": batch["bin"].cast(pa.int64()),
            "n": batch["sum(n)"].cast(pa.int64())})

    return merged.map_batches(rename, batch_format="pyarrow")


def value_histogram_sql(table, col, lo, hi, bins=32):
    """The matching DuckDB aggregation."""
    return f"""
        SELECT (least(greatest(CAST({col} AS BIGINT), {lo}), {hi})
                - {lo}) * {bins} // ({hi} - {lo} + 1) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM {table} GROUP BY 1"""


def grouped_mode(ds, key, val, alias="mode"):
    """Most-frequent ``val`` per ``key`` (grouped MODE, deterministic
    (count desc, value asc) tiebreak — SQL mode() leaves ties
    unspecified, so the oracle replays this explicit rank). Two-level
    combiner: per-batch (key, val, n) count partials bound the first
    shuffle to distinct pairs per batch; the per-key top-1 is a
    vectorized group reduce."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, val], sort=False).size()
        out = g.reset_index()
        out.columns = [key, val, "n"]
        out["n"] = out["n"].astype("int64")
        return out

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(val, sort=False)["n"].sum().reset_index()
        m = m.sort_values(["n", val], ascending=[False, True],
                          kind="mergesort")
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            alias: [m[val].iloc[0]],
            "n_mode": pd.Series([int(m["n"].iloc[0])], dtype="int64")})

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby(key).map_groups(top1, batch_format="pandas")


def grouped_mode_sql(table, key, val, alias="mode"):
    """The matching DuckDB window query (explicit tiebreak)."""
    return f"""
        WITH c AS (
          SELECT {key}, {val}, count(*) AS n
          FROM {table} GROUP BY {key}, {val}),
        r AS (
          SELECT {key}, {val}, n,
                 row_number() OVER (PARTITION BY {key}
                                    ORDER BY n DESC, {val}) AS rn
          FROM c)
        SELECT {key}, {val} AS {alias}, CAST(n AS BIGINT) AS n_mode
        FROM r WHERE rn = 1"""


def global_rank(ds, order_col, id_col, n_buckets=64, sample_size=4096,
                seed=0, keep=()):
    """EXACT global row_number() under ORDER BY (order_col, id_col) —
    the distributed ranking primitive (percentile assignment, top-N%
    gating, leaderboards) the Dataset API lacks (``sort`` orders blocks
    but assigns no ranks). Returns (id_col, order_col, rank), rank
    1-based and dense over the whole dataset; ``id_col`` must be a
    unique key (it makes the order total, so the result is
    deterministic at any partitioning).

    Scale shape: a bottom-m hash sketch (:func:`approx_quantiles`)
    picks ``n_buckets - 1`` range boundaries; ONE narrow pass projects
    (id, v, bucket) and materializes it (16-24 bytes/row — the
    pack_chunks narrowing); per-bucket counts aggregate to
    ``n_buckets`` driver rows whose exclusive prefix sum is broadcast
    in a closure; the final ``groupby(bucket)`` sorts each bucket
    locally and adds its base. Rows with EQUAL order values always
    land in one bucket (searchsorted on value), so ties never straddle
    a boundary and the id tiebreak stays bucket-local. Skewed values
    make one bucket large — the same hot-key tradeoff as any range
    partitioning; raise ``n_buckets`` or pre-salt by id if one value
    dominates."""
    from ray.data.aggregate import Sum

    qs = [i / float(n_buckets) for i in range(1, int(n_buckets))]
    qdf = approx_quantiles(ds, order_col, qs=qs,
                           sample_size=sample_size, id_col=id_col,
                           seed=seed)
    bounds = np.sort(np.asarray(qdf["value"].to_numpy()))

    def project(df: pd.DataFrame) -> pd.DataFrame:
        v = df[order_col].to_numpy()
        out = pd.DataFrame({
            "id": df[id_col].to_numpy().astype(np.int64),
            "v": v,
            "bucket": np.searchsorted(bounds, v, side="right")
            .astype(np.int64)})
        for c in keep:
            out[c] = df[c].to_numpy()
        return out

    narrow = ds.map_batches(project, batch_format="pandas").materialize()

    def bcount(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bucket", sort=False).size()
        return pd.DataFrame({"bucket": g.index.to_numpy(np.int64),
                             "n": g.to_numpy(np.int64)})

    counts = narrow.map_batches(bcount, batch_format="pandas") \
        .groupby("bucket").aggregate(Sum("n", alias_name="n")).take_all()
    base = np.zeros(int(n_buckets) + 1, np.int64)
    for r in counts:
        base[int(r["bucket"])] = int(r["n"])
    base = np.concatenate([[0], np.cumsum(base)[:-1]])

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["v", "id"], kind="mergesort")
        b = int(g["bucket"].iloc[0])
        out = pd.DataFrame({
            id_col: g["id"].to_numpy(np.int64),
            order_col: g["v"].to_numpy(),
            "rank": base[b] + 1 + np.arange(len(g), dtype=np.int64)})
        for c in keep:
            out[c] = g[c].to_numpy()
        return out

    return narrow.groupby("bucket").map_groups(rank_bucket,
                                               batch_format="pandas")


def global_rank_sql(table, order_col, id_col):
    """The matching DuckDB window query."""
    return f"""
        SELECT {id_col}, {order_col},
               CAST(row_number() OVER (ORDER BY {order_col}, {id_col})
                    AS BIGINT) AS rank
        FROM {table}"""


# ---------------------------------------------------------------------------
# per-key ordered running total (window SUM OVER PARTITION BY ... ORDER BY)

def running_total(ds, key, order_cols, val, scale=100,
                  alias="running_c", keep=()):
    """Cumulative per-key sum ordered within the key — the SQL window
    function ``SUM(val) OVER (PARTITION BY key ORDER BY order_cols)``
    as a distributed operator (engine-new; the reference has no
    ordered-window analytics at all).

    Scale shape: one ``groupby(key)`` shuffle co-locates each key's
    rows; the per-group kernel sorts ONLY its own rows and does one
    vectorized cumsum. This is the partition-key window idiom — cost
    per group is O(rows-in-group · log), never a global sort, and the
    exchange carries only the projected columns. Keys whose history
    exceeds a worker (a different regime) would use the range-bucket
    prefix-sum machinery of ``global_rank`` instead.

    Exactness: values are fixed-pointed (``round(val·scale)`` → int64)
    before summation, so the cumulative sums are exact integers and
    the SQL replay cannot diverge by float summation order.
    """
    order_cols = list(order_cols)
    cols = [key, *order_cols, val, *keep]

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(order_cols, kind="mergesort")
        cents = np.rint(g[val].to_numpy(np.float64) * scale)\
            .astype(np.int64)
        out = {key: g[key].to_numpy()}
        for c in (*order_cols, *keep):
            out[c] = g[c].to_numpy()
        out[alias] = np.cumsum(cents)
        return pd.DataFrame(out)

    return ds.select_columns(cols).groupby(key).map_groups(
        per_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact grouped second moments (covariance / correlation ingredients)

def grouped_moments(ds, key, x, y, x_scale=1, y_scale=1,
                    x_div=1, y_div=1):
    """Per-key exact second-moment sufficient statistics for Pearson
    correlation / covariance / regression: n, Σx, Σy, Σx², Σy², Σxy —
    the associative-partials pattern (combine inside ``map_batches``,
    then a tiny ``groupby().sum()``), so the exchange carries six int64
    per (key, batch) regardless of input size.

    Both columns are fixed-pointed (``round(col·scale)`` → int64) so
    every sum is exact integer arithmetic; corr/cov/slope are then pure
    functions of the six integers (computable identically anywhere,
    including in SQL) with no float-summation-order hazard. Caller
    picks scales so Σx² stays under 2^63 at the target corpus size;
    ``x_div``/``y_div`` floor-divide AFTER the exact fixed-pointing
    (e.g. scale=100, div=100 → exact floor dollars from cents) so wide
    columns can be coarsened without reintroducing half-rounding
    ambiguity.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xi = np.rint(df[x].to_numpy(np.float64) * x_scale)\
            .astype(np.int64) // x_div
        yi = np.rint(df[y].to_numpy(np.float64) * y_scale)\
            .astype(np.int64) // y_div
        g = pd.DataFrame({
            key: df[key].to_numpy(), "n": 1,
            "sum_x": xi, "sum_y": yi,
            "sum_xx": xi * xi, "sum_yy": yi * yi, "sum_xy": xi * yi,
        }).groupby(key, as_index=False).sum()
        for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"):
            g[c] = g[c].astype("int64")
        return g

    parts = ds.select_columns([key, x, y]).map_batches(
        partial, batch_format="pandas")
    agg = parts.groupby(key).sum(
        ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"])

    def rename(t: pa.Table) -> pa.Table:
        # aggregate output names are "sum(col)"; strip the wrapper
        # (Dataset.rename_columns on aggregate output is broken in
        # Ray 2.49 — rename via a pyarrow map instead, see NOTES.md)
        return t.rename_columns(
            [c[4:-1] if c.startswith("sum(") and c.endswith(")") else c
             for c in t.column_names])

    return agg.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min sketch (approximate frequencies, mergeable by elementwise sum)

def _cm_rows(vals, d, w):
    """(d, w) Count-Min increments for a value array: row r uses an
    independent keyed blake2 hash. Deterministic, partitioning-blind."""
    import hashlib
    out = np.zeros((d, w), dtype=np.int64)
    for v in vals:
        bv = str(v).encode()
        for r in range(d):
            h = int.from_bytes(
                hashlib.blake2b(bv, digest_size=8,
                                person=b"cm%02d" % r).digest(), "big")
            out[r, h % w] += 1
    return out


def cm_sketch(ds, col, d=4, w=1 << 12):
    """Build a Count-Min sketch of ``col``'s value frequencies — the
    classic mergeable frequency summary (Cormode & Muthukrishnan 2005):
    per-batch (d, w) count grids are ASSOCIATIVE (elementwise sum), so
    the exchange carries d·w int64 per batch regardless of input size,
    and the merged sketch answers point frequency queries with
    one-sided error ≤ εN (ε = e/w) at confidence 1 − e^{−d}.

    Complements the exact `heavy_hitters` operator: the sketch path
    when the candidate-restricted exact pass is too expensive and a
    bounded overestimate is acceptable. Per-block grids are merged by
    Ray's aggregate tree (the bloom-bitmap pattern) — the driver only
    ever sees the single final (d, w) grid, never one grid per batch."""
    from ray.data.aggregate import AggregateFn

    def acc(state, block):
        vals = block[col]
        vals = vals.to_pylist() if hasattr(vals, "to_pylist") \
            else list(vals)
        state += _cm_rows(vals, d, w)
        return state

    agg = AggregateFn(
        init=lambda k: np.zeros((d, w), dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc,
        name="cm")
    return ds.select_columns([col]).aggregate(agg)["cm"]


def cm_query(sketch, values):
    """Point-frequency estimates (min over rows) for ``values``."""
    import hashlib
    d, w = sketch.shape
    out = []
    for v in values:
        bv = str(v).encode()
        est = None
        for r in range(d):
            h = int.from_bytes(
                hashlib.blake2b(bv, digest_size=8,
                                person=b"cm%02d" % r).digest(), "big")
            c = int(sketch[r, h % w])
            est = c if est is None else min(est, c)
        out.append(est)
    return np.asarray(out, dtype=np.int64)


def moving_window(ds, key, order_cols, val, k, scale=100,
                  sum_alias="win_sum_c", cnt_alias="win_n"):
    """Per-key trailing ROWS-frame aggregate — SQL's
    ``SUM(val) OVER (PARTITION BY key ORDER BY order_cols
    ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)`` plus the frame row
    count. Same partition-key window idiom as :func:`running_total`
    (one key shuffle, per-group sort), with the frame sum computed as a
    cumsum difference — O(rows) per group at any ``k``, exact int64
    fixed-point cents."""
    order_cols = list(order_cols)
    cols = [key, *order_cols, val]

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(order_cols, kind="mergesort")
        cents = np.rint(g[val].to_numpy(np.float64) * scale)\
            .astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(cents)))
        n = len(cents)
        idx = np.arange(n)
        lo = np.maximum(0, idx - k + 1)
        out = {key: g[key].to_numpy()}
        for c in order_cols:
            out[c] = g[c].to_numpy()
        out[sum_alias] = cs[idx + 1] - cs[lo]
        out[cnt_alias] = (idx - lo + 1).astype(np.int64)
        return pd.DataFrame(out)

    return ds.select_columns(cols).groupby(key).map_groups(
        per_group, batch_format="pandas")


def grouped_string_agg(ds, key, val, order_cols, sep=",",
                       alias="agg_str"):
    """Deterministic per-key ordered string concatenation — SQL's
    ``string_agg(val, sep ORDER BY order_cols)`` distributed: one
    ``groupby(key)`` shuffle, per-group mergesort, one join. The
    within-group ORDER BY is what makes a distributed string_agg
    deterministic at all — an unordered concat varies with block
    arrival and can never be oracle-checked."""
    order_cols = list(order_cols)
    cols = list(dict.fromkeys([key, val, *order_cols]))

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(order_cols, kind="mergesort")
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            alias: [sep.join(str(v) for v in g[val])],
            "n_items": pd.Series([len(g)], dtype="int64")})

    return ds.select_columns(cols).groupby(key).map_groups(
        per_group, batch_format="pandas")


def grouped_rank(ds, key, order_col, descending=True, keep=()):
    """Full per-key ranking with ANSI tie semantics — ``rank()`` (gaps
    after ties) and ``dense_rank()`` (no gaps) OVER (PARTITION BY key
    ORDER BY order_col): one ``groupby(key)`` shuffle, then vectorized
    rank assignment inside each group (sort + searchsorted against the
    distinct order values — no Python loop). Ties get identical ranks
    by definition, so the output is deterministic with NO tiebreak
    column, unlike top-k truncation."""
    keep = list(keep)
    cols = list(dict.fromkeys([key, order_col, *keep]))

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        v = df[order_col].to_numpy()
        sv = np.sort(v)
        if descending:
            # rank 1 = largest: count of values strictly greater, +1
            rnk = len(v) - np.searchsorted(sv, v, side="right") + 1
            uniq = np.unique(v)
            drk = len(uniq) - np.searchsorted(uniq, v, side="left")
        else:
            rnk = np.searchsorted(sv, v, side="left") + 1
            uniq = np.unique(v)
            drk = np.searchsorted(uniq, v, side="left") + 1
        out = {key: df[key].to_numpy(), order_col: v}
        for c in keep:
            out[c] = df[c].to_numpy()
        out["rnk"] = rnk.astype(np.int64)
        out["drnk"] = drk.astype(np.int64)
        return pd.DataFrame(out)

    return ds.select_columns(cols).groupby(key).map_groups(
        per_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# ANSI bucket/distribution window functions: ntile, percent_rank, cume_dist

def grouped_ntile(ds, key, val_col, tiebreaks, n, keep=()):
    """The ANSI distribution window-function family per key —
    ``ntile(n)``, ``percent_rank()`` and ``cume_dist()`` OVER
    (PARTITION BY key ...) — as one distributed operator (engine-new;
    no reference analogue).

    Ordering contracts (mirroring the SQL standard exactly):
    - ``ntile`` requires a TOTAL order to be deterministic (the
      standard lets ties land in either bucket), so its ORDER BY is
      (val_col DESC, *tiebreaks ASC); bucket sizes follow the ANSI
      rule — with n_rows = q·n + r, the first r buckets get q+1 rows.
    - ``percent_rank`` = (rank−1)/(n_rows−1) and ``cume_dist`` =
      n_peers_le/n_rows are computed on val_col ALONE with tie
      semantics (tied rows share the value), so they are deterministic
      without any tiebreak — and the huge tie groups of a
      low-cardinality value genuinely exercise that.

    Scale shape: one ``groupby(key)`` shuffle of the projected columns,
    then vectorized sort + searchsorted inside each group (same regime
    as ``running_total`` — per-key history fits a worker; beyond that
    the range-bucket machinery of ``global_rank`` applies).

    The two ratios are emitted as float64 divisions of exact int64
    counts — IEEE division is exactly rounded, so any engine computing
    the same two integers (e.g. the DuckDB replay) produces the
    bit-identical double.
    """
    tiebreaks = list(tiebreaks)
    cols = list(dict.fromkeys([key, val_col, *tiebreaks, *keep]))

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values([val_col, *tiebreaks],
                           ascending=[False] + [True] * len(tiebreaks),
                           kind="mergesort")
        n_rows = len(g)
        idx = np.arange(n_rows, dtype=np.int64)
        q, r = divmod(n_rows, n)
        if q == 0:
            bucket = idx + 1
        else:
            cut = (q + 1) * r
            bucket = np.where(idx < cut, idx // (q + 1),
                              r + (idx - cut) // q) + 1
        v = g[val_col].to_numpy()
        neg = -v  # v is sorted desc -> -v asc for searchsorted
        first = np.searchsorted(neg, neg, side="left")
        peers_le = np.searchsorted(neg, neg, side="right")
        rnk = first + 1
        pct = ((rnk - 1) / float(n_rows - 1) if n_rows > 1
               else np.zeros(n_rows))
        out = {key: g[key].to_numpy(), val_col: v}
        for c in (*tiebreaks, *keep):
            if c not in out:
                out[c] = g[c].to_numpy()
        out["bucket"] = bucket.astype(np.int64)
        out["pct_rank"] = np.asarray(pct, np.float64)
        out["cume_dist"] = peers_le / float(n_rows)
        return pd.DataFrame(out)

    return ds.select_columns(cols).groupby(key).map_groups(
        per_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# multiset set operations: EXCEPT ALL / INTERSECT ALL

def multiset_ops(left, right, cols):
    """Distributed EXCEPT ALL / INTERSECT ALL over the row-multisets of
    two datasets projected to ``cols`` (engine-new). Returns one row
    per distinct key appearing on the LEFT side with exact multiset
    arithmetic: ``n_left``, ``n_right``, ``n_except`` =
    max(n_left − n_right, 0) (the EXCEPT ALL multiplicity) and
    ``n_intersect`` = min(n_left, n_right) (the INTERSECT ALL
    multiplicity). Keys present only on the right are dropped, exactly
    as EXCEPT ALL/INTERSECT ALL output no such rows.

    Scale shape: the combiner-before-shuffle pattern — each batch
    collapses to per-key (count_left, count_right) partials, so the
    single ``groupby(cols)`` exchange carries two int64 per distinct
    key per batch regardless of row count; the set arithmetic is then
    pure integer math on the merged counts. This is the same exchange
    a distributed EXCEPT/INTERSECT (DISTINCT) needs — those are the
    special case clamping counts to 1 before the arithmetic.
    """
    from ray.data.aggregate import Sum
    cols = list(cols)

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            g = df[cols].copy()
            g["__n"] = np.int64(1)
            g = g.groupby(cols, as_index=False).sum()
            out = g[cols].copy()
            out["n_left"] = (g["__n"].to_numpy(np.int64)
                             if side == 0 else
                             np.zeros(len(g), np.int64))
            out["n_right"] = (g["__n"].to_numpy(np.int64)
                              if side == 1 else
                              np.zeros(len(g), np.int64))
            return out
        return fn

    both = left.select_columns(cols)\
        .map_batches(tag(0), batch_format="pandas")\
        .union(right.select_columns(cols)
               .map_batches(tag(1), batch_format="pandas"))
    merged = both.groupby(cols).aggregate(
        Sum("n_left", alias_name="n_left"),
        Sum("n_right", alias_name="n_right"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nl = df["n_left"].to_numpy(np.int64)
        nr = df["n_right"].to_numpy(np.int64)
        out = df[[*cols]].copy()
        out["n_left"] = nl
        out["n_right"] = nr
        out["n_except"] = np.maximum(nl - nr, 0)
        out["n_intersect"] = np.minimum(nl, nr)
        return out[nl > 0]

    return merged.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# market-basket pair mining (frequent itemset pairs) and distributed
# triangle counting over the co-occurrence graph

def basket_pairs(ds, basket_col, item_col, min_support=2,
                 pairs_only=False):
    """Frequent co-occurring item PAIRS across baskets — the support
    table behind association rules (engine-new; no reference
    analogue). Output per surviving pair: ``a < b``, ``n_ab`` (baskets
    containing both), ``n_a``/``n_b`` (baskets containing each) — the
    exact integer ingredients of support and confidence.

    Scale shape: per-batch (basket, item) dedup is the combiner before
    ONE ``groupby(basket)`` co-location; the per-basket kernel emits
    each basket's C(k,2) distinct pairs (fan-out bounded by basket
    size, a domain property — salt a pathological mega-basket
    upstream); pair counts then merge through a second narrow
    ``groupby(a, b)`` bounded by one row per distinct pair per batch.
    Item supports are exact COUNT(DISTINCT basket) via the existing
    pair-dedup combiner (``count_distinct``) and are attached with two
    partitioned hash joins — no driver-side materialization anywhere.
    ``pairs_only=True`` skips the support computation entirely and
    returns just (a, b, n_ab) — for consumers (graph builds) that only
    need the edge set.
    """
    from ray.data.aggregate import Sum

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[[basket_col, item_col]].drop_duplicates()

    bi = ds.select_columns([basket_col, item_col]).map_batches(
        dedup, batch_format="pandas")

    # co-locate baskets by HASH PART, not by basket: Ray's map_groups
    # costs ~0.4 ms per GROUP at any size, so one group per basket is
    # the slow path (the label/trend lesson) — a fixed number of hash
    # buckets keeps the exchange identical (parts partition baskets, so
    # per-part pair partials sum exactly to the global counts) while
    # the within-part loop over basket slices is plain numpy.
    _P = 256
    _MULT = np.int64(2654435761)

    def addpart(df: pd.DataFrame) -> pd.DataFrame:
        b = df[basket_col].to_numpy(np.int64)
        out = df[[basket_col, item_col]].copy()
        out["_part"] = ((b * _MULT) % np.int64(1 << 31)) % _P
        return out

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        b = g[basket_col].to_numpy(np.int64)
        it = g[item_col].to_numpy(np.int64)
        order = np.lexsort((it, b))
        b, it = b[order], it[order]
        starts = np.append(np.flatnonzero(np.diff(b)) + 1, len(b))
        pa_, pb_ = [], []
        s = 0
        for e in starts:
            items = np.unique(it[s:e])   # cross-batch (basket, item)
            s = e                        # dups dedup here
            if len(items) >= 2:
                iu, ju = np.triu_indices(len(items), k=1)
                pa_.append(items[iu])
                pb_.append(items[ju])
        if not pa_:
            return pd.DataFrame({
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "n_ab": pd.Series([], dtype="int64")})
        out = pd.DataFrame({"a": np.concatenate(pa_),
                            "b": np.concatenate(pb_),
                            "n_ab": np.int64(1)})
        return out.groupby(["a", "b"], as_index=False).sum()

    # second exchange: merge per-basket-part partials of the SAME pair.
    # NEVER groupby the pair key itself — a Ray aggregate costs ~0.4 ms
    # per GROUP, so one group per distinct pair is minutes at 10^5
    # pairs (NOTES lesson 61); hash-partition pairs into _P bounded
    # groups and do the per-pair sum vectorized inside each.
    def add_pp(df: pd.DataFrame) -> pd.DataFrame:
        key = (df["a"].to_numpy(np.int64) * np.int64(1000003)
               + df["b"].to_numpy(np.int64))
        out = df.copy()
        out["_pp"] = ((key * _MULT) % np.int64(1 << 31)) % _P
        return out

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], as_index=False)["n_ab"].sum()
        out = out[out["n_ab"].to_numpy() >= min_support]
        return out.astype({"a": "int64", "b": "int64", "n_ab": "int64"})

    pair_counts = bi.map_batches(addpart, batch_format="pandas")\
        .groupby("_part").map_groups(pairs_part, batch_format="pandas")\
        .map_batches(add_pp, batch_format="pandas")\
        .groupby("_pp").map_groups(merge_part, batch_format="pandas")

    if pairs_only:
        return pair_counts

    support = count_distinct(bi, item_col, basket_col, alias="n_item")
    sup_a = support.map_batches(
        lambda df: pd.DataFrame({
            "a": df[item_col].astype("int64"),
            "n_a": df["n_item"].astype("int64")}), batch_format="pandas")
    sup_b = support.map_batches(
        lambda df: pd.DataFrame({
            "b": df[item_col].astype("int64"),
            "n_b": df["n_item"].astype("int64")}), batch_format="pandas")
    j1 = hash_join(pair_counts, sup_a, "a",
                   left_cols=["b", "n_ab"], right_cols=["n_a"])
    return hash_join(j1, sup_b, "b",
                     left_cols=["a", "n_ab", "n_a"],
                     right_cols=["n_b"])


def triangle_count(edges, a="a", b="b"):
    """EXACT distributed triangle count over an undirected graph given
    as distinct edges ``a < b`` (int64 node ids) — the classic
    degree-ordered wedge-closure algorithm (engine-new):

    1. degrees via a count combiner + one ``groupby(node)``;
    2. each edge oriented from its (degree, id)-smaller endpoint
       (attached by two partitioned hash joins — both sides stay
       distributed), which bounds every out-adjacency by O(√m);
    3. wedges: per-source C(outdeg, 2) candidate closing pairs — the
       Σ outdeg² ≤ m^1.5 bound is exactly why the orientation exists;
    4. closure: a semi-join of the wedge pairs against the edge set on
       a packed (lo·2³¹+hi) key. Every triangle has exactly one vertex
       with two out-edges in a total-order orientation, so each is
       counted once.

    Returns a one-row DataFrame: n_nodes, n_edges, n_triangles.
    The edge table is materialized once (it is the reduced working
    set, far smaller than the corpus that produced it) because three
    passes read it: degrees, orientation, closure.
    """
    from ray.data.aggregate import Sum
    edges = edges.materialize()

    def ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "v": np.concatenate([df[a].to_numpy(np.int64),
                                 df[b].to_numpy(np.int64)]),
            "deg": np.int64(1)}).groupby("v", as_index=False).sum()

    deg = edges.map_batches(ends, batch_format="pandas")\
        .groupby("v").aggregate(Sum("deg", alias_name="deg"))
    n_nodes = deg.count()
    n_edges = edges.count()
    deg_a = deg.map_batches(
        lambda df: pd.DataFrame({a: df["v"].astype("int64"),
                                 "deg_a": df["deg"].astype("int64")}),
        batch_format="pandas")
    deg_b = deg.map_batches(
        lambda df: pd.DataFrame({b: df["v"].astype("int64"),
                                 "deg_b": df["deg"].astype("int64")}),
        batch_format="pandas")
    e1 = hash_join(edges, deg_a, a, left_cols=[b], right_cols=["deg_a"])
    e2 = hash_join(e1, deg_b, b, left_cols=[a, "deg_a"],
                   right_cols=["deg_b"])

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        av = df[a].to_numpy(np.int64)
        bv = df[b].to_numpy(np.int64)
        da = df["deg_a"].to_numpy(np.int64)
        db = df["deg_b"].to_numpy(np.int64)
        a_first = (da < db) | ((da == db) & (av < bv))
        return pd.DataFrame({"src": np.where(a_first, av, bv),
                             "dst": np.where(a_first, bv, av)})

    # wedge generation groups by a HASH BUCKET of the source, not the
    # source itself: Ray groupby costs ~0.4 ms of scheduling per GROUP
    # (the stages/label.py lesson), so per-node groups would dominate on
    # million-node graphs — per-bucket groups amortize it 256x and the
    # per-source triu expansion runs as a plain loop inside the bucket.
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"pk": pd.Series([], dtype="int64")})
        g = g.sort_values(["src", "dst"])
        srcs = g["src"].to_numpy(np.int64)
        dsts = g["dst"].to_numpy(np.int64)
        cuts = np.flatnonzero(np.diff(srcs)) + 1
        pks = []
        for d in np.split(dsts, cuts):
            d = np.unique(d)
            if len(d) < 2:
                continue
            iu, ju = np.triu_indices(len(d), k=1)
            pks.append(d[iu] * (np.int64(1) << 31) + d[ju])
        if not pks:
            return pd.DataFrame({"pk": pd.Series([], dtype="int64")})
        return pd.DataFrame({"pk": np.concatenate(pks)})

    w = e2.map_batches(orient, batch_format="pandas")\
        .map_batches(lambda df: df.assign(bk=df["src"] % 256),
                     batch_format="pandas")\
        .groupby("bk").map_groups(wedges, batch_format="pandas")
    ek = edges.map_batches(
        lambda df: pd.DataFrame({
            "pk": df[a].to_numpy(np.int64) * (np.int64(1) << 31)
            + df[b].to_numpy(np.int64)}), batch_format="pandas")
    n_tri = semi_join(w, ek, "pk").count()
    return pd.DataFrame({
        "n_nodes": pd.Series([n_nodes], dtype="int64"),
        "n_edges": pd.Series([n_edges], dtype="int64"),
        "n_triangles": pd.Series([n_tri], dtype="int64")})


def common_neighbors(edges, k=20, deg_cap=64, min_common=2,
                     a="a", b="b"):
    """Link prediction by common-neighbor count — the classic
    recommender / graph-completion score: for every NON-adjacent node
    pair (u < v), the number of shared neighbors, returned as the
    global top-``k`` with the deterministic (count DESC, u, v)
    tiebreak. Complements :func:`triangle_count` (which counts CLOSED
    wedges; this scores the open ones).

    Scale shape: wedge enumeration is apex-centric (a wedge exists per
    apex w adjacent to both u and v), so the honest cost is
    Σ C(deg(w), 2); ``deg_cap`` drops hub apexes above it (hubs carry
    little link-prediction signal and quadratic fan-out — the cap is
    part of the operator contract and the SQL oracle replays it).
    Adjacency co-locates per node through ONE 256-bucket hash exchange
    (never one Ray group per node — the ~0.4 ms/group lesson), pair
    partials merge in a second hash-partitioned bounded exchange
    (basket_pairs pattern), existing edges leave via the tag-union
    anti-join on a packed (u·2³¹+v) key, and only ≤k rows reach the
    driver. Node ids must fit 31 bits."""
    edges = edges.materialize()
    _P = 256
    _MULT = np.int64(2654435761)

    def adjacency(df: pd.DataFrame) -> pd.DataFrame:
        node = np.concatenate([df[a].to_numpy(np.int64),
                               df[b].to_numpy(np.int64)])
        nbr = np.concatenate([df[b].to_numpy(np.int64),
                              df[a].to_numpy(np.int64)])
        return pd.DataFrame({
            "node": node, "nbr": nbr,
            "_part": ((node * _MULT) % np.int64(1 << 31)) % _P})

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].to_numpy(np.int64)
        nbr = g["nbr"].to_numpy(np.int64)
        order = np.lexsort((nbr, node))
        node, nbr = node[order], nbr[order]
        starts = np.append(np.flatnonzero(np.diff(node)) + 1, len(node))
        us, vs = [], []
        s = 0
        for e in starts:
            nb = nbr[s:e]            # already unique: edges are distinct
            s = e
            if 2 <= len(nb) <= deg_cap:
                iu, ju = np.triu_indices(len(nb), k=1)
                us.append(nb[iu])
                vs.append(nb[ju])
        if not us:
            return pd.DataFrame({
                "u": pd.Series([], dtype="int64"),
                "v": pd.Series([], dtype="int64"),
                "n_common": pd.Series([], dtype="int64")})
        out = pd.DataFrame({"u": np.concatenate(us),
                            "v": np.concatenate(vs),
                            "n_common": np.int64(1)})
        return out.groupby(["u", "v"], as_index=False).sum()

    def add_pp(df: pd.DataFrame) -> pd.DataFrame:
        key = (df["u"].to_numpy(np.int64) * np.int64(1000003)
               + df["v"].to_numpy(np.int64))
        out = df.copy()
        out["_pp"] = ((key * _MULT) % np.int64(1 << 31)) % _P
        return out

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["u", "v"], as_index=False)["n_common"].sum()
        out = out[out["n_common"].to_numpy() >= min_common]
        out = out.astype({"u": "int64", "v": "int64",
                          "n_common": "int64"})
        out["pk"] = (out["u"].to_numpy(np.int64) * (np.int64(1) << 31)
                     + out["v"].to_numpy(np.int64))
        return out

    cand = edges.map_batches(adjacency, batch_format="pandas")\
        .groupby("_part").map_groups(wedge_pairs, batch_format="pandas")\
        .map_batches(add_pp, batch_format="pandas")\
        .groupby("_pp").map_groups(merge_part, batch_format="pandas")

    ek = edges.map_batches(
        lambda df: pd.DataFrame({
            "pk": df[a].to_numpy(np.int64) * (np.int64(1) << 31)
            + df[b].to_numpy(np.int64)}), batch_format="pandas")
    nonedge = anti_join(cand, ek, "pk")

    def drop_aux(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["u", "v", "n_common"]].copy()
        out["_g"] = np.int64(0)
        return out

    top = grouped_topk(nonedge.map_batches(drop_aux,
                                           batch_format="pandas"),
                       ["_g"], "n_common", k, tiebreak=("u", "v"))
    return top.map_batches(
        lambda df: df[["u", "v", "n_common", "rank"]].astype(
            {"u": "int64", "v": "int64", "n_common": "int64",
             "rank": "int64"}),
        batch_format="pandas")


def common_neighbors_sql(edges_cte, k=20, deg_cap=64, min_common=2):
    """DuckDB replay: adjacency both directions, apex degree cap,
    wedge self-join counts, anti-join of existing edges, window
    top-k."""
    return f"""
        WITH {edges_cte},
        adj AS (SELECT a AS node, b AS nbr FROM e
                UNION ALL SELECT b, a FROM e),
        d AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),
        cn AS (
          SELECT x.nbr AS u, y.nbr AS v,
                 CAST(count(*) AS BIGINT) AS n_common
          FROM adj x JOIN adj y
            ON x.node = y.node AND x.nbr < y.nbr
          WHERE x.node IN (SELECT node FROM d WHERE deg <= {deg_cap})
          GROUP BY 1, 2
          HAVING count(*) >= {min_common}),
        nonedge AS (
          SELECT u, v, n_common FROM cn
          WHERE NOT EXISTS (SELECT 1 FROM e
                            WHERE e.a = cn.u AND e.b = cn.v)),
        r AS (SELECT u, v, n_common,
                     row_number() OVER (ORDER BY n_common DESC, u, v)
                       AS rank
              FROM nonedge)
        SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
               n_common, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# keyed snapshot diff (change-data-capture between two table versions)

def snapshot_diff(old, new, key, val):
    """Change detection between two KEY-UNIQUE snapshots of a table —
    the CDC / SCD primitive: per key, status ``added`` (new only),
    ``removed`` (old only), ``changed`` or ``same``, with both values
    (0 where the side is absent, disambiguated by the status).

    Scale shape: the tag-union pattern — each side ships its (key,
    val) rows once through a single ``groupby(key)`` exchange; the
    per-key kernel sees at most one row per side (asserted loudly:
    key-unique snapshots are the contract; aggregate upstream if not).
    """

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                key: df[key].astype(np.int64),
                "_side": np.int8(side),
                "_v": df[val].astype(np.int64)})
        return fn

    both = old.select_columns([key, val]).map_batches(
        tag(0), batch_format="pandas").union(
        new.select_columns([key, val]).map_batches(
            tag(1), batch_format="pandas"))

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["_side"] == 0]["_v"].to_numpy(np.int64)
        n = g[g["_side"] == 1]["_v"].to_numpy(np.int64)
        if len(o) > 1 or len(n) > 1:
            raise ValueError(
                "snapshot_diff: inputs must be key-unique; key %r has "
                "%d old / %d new rows" % (g[key].iloc[0], len(o),
                                          len(n)))
        ov = int(o[0]) if len(o) else 0
        nv = int(n[0]) if len(n) else 0
        status = ("removed" if not len(n) else
                  "added" if not len(o) else
                  "same" if ov == nv else "changed")
        return pd.DataFrame({
            key: [np.int64(g[key].iloc[0])],
            "status": [status],
            "old_v": pd.Series([ov], dtype="int64"),
            "new_v": pd.Series([nv], dtype="int64")})

    return both.groupby(key).map_groups(diff, batch_format="pandas")


# ---------------------------------------------------------------------------
# fixed-point PageRank (fixed iteration count) over an undirected graph

PR_SCALE = 1 << 20


def pagerank_iters(edges, a="a", b="b", iters=3, scale=PR_SCALE,
                   damping_num=85, damping_den=100):
    """PageRank with a FIXED iteration count in EXACT fixed-point
    integer arithmetic (engine-new) — every operation is an int64
    floor: r₀ = scale; rₖ₊₁ = (scale·(den−num))//den +
    (num·Σ_{in} (rₖ//outdeg))//den. Because no float ever enters, the
    result is bit-identical at any partitioning AND expressible as a
    chain of plain SQL aggregates — the DuckDB oracle replays the
    iterations as stacked CTEs, which is what makes a distributed
    PageRank hash-checkable at all.

    Scale shape per iteration: ONE partitioned hash join (ranks ⨝
    directed edges on source) and ONE groupby(dst) sum — the classic
    message-passing round; rank state is a (node, r) table that never
    leaves the cluster. The directed edge table (both orientations of
    each undirected edge) and the degree table are built once and
    materialized (they are the reduced working set, re-read every
    round).
    """
    from ray.data.aggregate import Sum

    def direct(df: pd.DataFrame) -> pd.DataFrame:
        av = df[a].to_numpy(np.int64)
        bv = df[b].to_numpy(np.int64)
        return pd.DataFrame({
            "s": np.concatenate([av, bv]),
            "t": np.concatenate([bv, av])})

    d = edges.map_batches(direct, batch_format="pandas").materialize()

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("s", as_index=False).size()
        return pd.DataFrame({"s": g["s"].to_numpy(np.int64),
                             "dg": g["size"].to_numpy(np.int64)})

    deg = d.map_batches(deg_part, batch_format="pandas")\
        .groupby("s").aggregate(Sum("dg", alias_name="dg"))\
        .map_batches(lambda df: df.astype({"s": "int64", "dg": "int64"}),
                     batch_format="pandas").materialize()

    base = (scale * (damping_den - damping_num)) // damping_den
    ranks = deg.map_batches(
        lambda df: pd.DataFrame({"v": df["s"].astype("int64"),
                                 "r": np.int64(scale)}),
        batch_format="pandas")

    for _ in range(iters):
        # contributions: rank and degree co-keyed on the SOURCE node
        rd = hash_join(ranks, deg.map_batches(
            lambda df: pd.DataFrame({"v": df["s"].astype("int64"),
                                     "dg": df["dg"].astype("int64")}),
            batch_format="pandas"), "v",
            left_cols=["r"], right_cols=["dg"])
        contrib_src = rd.map_batches(
            lambda df: pd.DataFrame({
                "s": df["v"].astype("int64"),
                "c": df["r"].astype("int64").to_numpy()
                // df["dg"].astype("int64").to_numpy()}),
            batch_format="pandas")
        per_dst = hash_join(d, contrib_src, "s",
                            left_cols=["t"], right_cols=["c"])\
            .map_batches(
            lambda df: pd.DataFrame({
                "v": df["t"].astype("int64"),
                "c": df["c"].astype("int64")})
            .groupby("v", as_index=False).sum(),
            batch_format="pandas").groupby("v").aggregate(
            Sum("c", alias_name="c"))
        ranks = per_dst.map_batches(
            lambda df: pd.DataFrame({
                "v": df["v"].astype("int64"),
                "r": np.int64(base)
                + (damping_num * df["c"].astype("int64").to_numpy())
                // damping_den}), batch_format="pandas")

    return ranks


# ---------------------------------------------------------------------------
# skyline (Pareto frontier) via the local-skyline combiner

def _pareto_mask(vals):
    """Boolean mask of non-dominated rows. ``vals`` is (n, d) float64
    already oriented so SMALLER IS BETTER in every column. x dominates
    y iff x <= y everywhere and x < y somewhere. O(n²) vectorized in
    d·n² comparisons — callers bound n (a batch, or the union of local
    skylines)."""
    n = len(vals)
    if n == 0:
        return np.zeros(0, dtype=bool)
    le = np.ones((n, n), dtype=bool)
    lt = np.zeros((n, n), dtype=bool)
    for j in range(vals.shape[1]):
        c = vals[:, j]
        le &= c[:, None] <= c[None, :]
        lt |= c[:, None] < c[None, :]
    dominated = (le & lt).any(axis=0)
    return ~dominated


def skyline(ds, cols, directions, keep=()):
    """The SKYLINE / Pareto-frontier operator (preference queries;
    Börzsönyi et al. 2001; engine-new): rows not dominated by any
    other row, ``directions[i]`` ∈ {"min", "max"} per column.

    Scale shape: the local-skyline COMBINER — dominance is transitive,
    so every batch can drop its dominated rows before anything moves
    (a batch's skyline is a superset of its contribution to the global
    one); only the local survivors travel to a single final merge
    group. The exchange is bounded by Σ per-batch skyline sizes —
    small for correlated data, and the worst case (anti-correlated
    columns, skyline ≈ everything) is a property of the QUERY, not of
    the operator. Duplicated points dominate nothing strictly, so all
    copies survive — same as SQL NOT EXISTS dominance.
    """
    if len(cols) != len(directions) or \
            any(d not in ("min", "max") for d in directions):
        raise ValueError("skyline: directions must be min/max per col")
    keep = list(keep)
    sign = np.array([1.0 if d == "min" else -1.0 for d in directions])

    def oriented(df):
        return df[list(cols)].to_numpy(np.float64) * sign

    def local(df: pd.DataFrame) -> pd.DataFrame:
        out = df[list(cols) + keep]
        out = out[_pareto_mask(oriented(df))].copy()
        out["_one"] = np.int8(0)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g[_pareto_mask(oriented(g))]
        return out.drop(columns=["_one"])

    return ds.select_columns(list(cols) + keep).map_batches(
        local, batch_format="pandas").groupby("_one").map_groups(
        final, batch_format="pandas")


# ---------------------------------------------------------------------------
# mixture sampling: per-group deterministic Bernoulli rates

def mixture_sample(ds, group_col, id_col, rates, default_rate=0.0,
                   seed=0):
    """Training-data MIXTURE construction: sample each group (source /
    domain / language) at its own rate, deterministically by md5 of
    the row id — the standard way LLM corpora reweight sources. Rows
    never migrate as the corpus grows (same md5-threshold contract as
    ``bernoulli_sample``); one stateless pass, no exchange.
    """

    def thresh(g):
        r = rates.get(g, default_rate)
        # rate >= 1 must keep EVERY row: "%08x" of 2^32 is NINE chars
        # ("100000000") and loses the lexicographic compare to almost
        # every 8-char digest — 'g' sorts above all hex instead
        return "g" if r >= 1.0 else "%08x" % int(r * (1 << 32))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5_hex8(df[id_col], seed)
        th = df[group_col].map(thresh).to_numpy(dtype=str)
        return df[h < th]

    return ds.map_batches(fn, batch_format="pandas")


def mixture_sample_sql_pred(group_expr, id_expr, rates,
                            default_rate=0.0, seed=0):
    """The matching DuckDB predicate: a CASE over per-group hex
    thresholds with the same lexicographic md5 comparison."""
    def hx(r):
        return "g" if r >= 1.0 else "%08x" % int(r * (1 << 32))

    cases = " ".join("WHEN '%s' THEN '%s'" % (g, hx(r))
                     for g, r in sorted(rates.items()))
    default = hx(default_rate)
    return ("substr(md5(CAST(%s AS VARCHAR) || ':%d'), 1, 8) < "
            "(CASE %s %s ELSE '%s' END)"
            % (id_expr, seed, group_expr, cases, default))


# ---------------------------------------------------------------------------
# incremental aggregate maintenance (IVM): fold a delta into a state

def merge_aggregate(state, delta, key, val):
    """Incremental view maintenance for a SUM/COUNT aggregate: fold a
    DELTA (raw keyed rows, possibly many per key) into an existing
    aggregated STATE (key-unique) without recomputing from scratch —
    the nightly-batch upsert every warehouse pipeline runs. Output is
    the new key-unique state: state value + sum(delta values), keys
    from either side.

    Scale shape: the delta side pre-aggregates per batch (combiner),
    then both sides ride ONE tag-union ``groupby(key)`` — the
    exchange carries the state rows plus one row per (key, delta
    batch), never the raw delta multiplicity.
    """
    from ray.data.aggregate import Sum

    def tag_state(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key: df[key].astype(np.int64),
                             "_v": df[val].astype(np.int64)})

    def tag_delta(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({key: df[key].astype(np.int64),
                          "_v": df[val].astype(np.int64)})
        return g.groupby(key, as_index=False).sum()

    both = state.select_columns([key, val]).map_batches(
        tag_state, batch_format="pandas").union(
        delta.select_columns([key, val]).map_batches(
            tag_delta, batch_format="pandas"))
    out = both.groupby(key).aggregate(Sum("_v", alias_name=val))
    return out.map_batches(
        lambda df: df.astype({key: "int64", val: "int64"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# broadcast range lookup (non-equi BETWEEN join against a small table)

def range_lookup(ds, val_col, bands, label_col="band", keep=()):
    """Non-equi BETWEEN lookup against a SMALL sorted band table — the
    IP-to-geo / price-band / rating-bucket pattern: each row's value
    is assigned the label of the band whose [lo, hi) interval contains
    it. ``bands`` is a list of (lo, hi, label) with lo sorted
    ascending; intervals must not overlap (asserted once). Rows
    outside every band get label -1.

    Scale shape: the band table broadcasts by value in the closure
    (small by contract); the lookup is one ``searchsorted`` per batch
    — a stateless map, zero exchange, where a naive plan would shuffle
    for a theta-join.
    """
    bands = sorted(bands)
    lows = np.array([b[0] for b in bands], dtype=np.int64)
    highs = np.array([b[1] for b in bands], dtype=np.int64)
    labels = np.array([b[2] for b in bands], dtype=np.int64)
    if not ((highs[:-1] <= lows[1:]).all() and (lows < highs).all()):
        raise ValueError("range_lookup: bands must be disjoint, "
                         "lo-sorted, and non-empty")
    keep = list(keep)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.int64)
        pos = np.searchsorted(lows, v, side="right") - 1
        safe = np.maximum(pos, 0)
        hit = (pos >= 0) & (v < highs[safe])
        out = df[[val_col, *keep]].copy()
        out[label_col] = np.where(hit, labels[safe], -1).astype(np.int64)
        return out

    return ds.select_columns([val_col, *keep]).map_batches(
        fn, batch_format="pandas")


def cube_sums(ds, keys, val, scale=100, marker=ROLLUP_ALL):
    """GROUP BY CUBE(*keys): exact scaled-integer sum + count for
    EVERY subset of ``keys`` (2^k grouping sets) in ONE shuffle —
    the same combiner idea as :func:`rollup_sums`, but iterating all
    subsets instead of prefixes. The exchange carries at most
    Σ_subsets |groups| rows per batch (2^k is small by contract — a
    CUBE over many columns is a query smell, not an operator
    problem); rolled-away positions carry ``marker``.
    """
    import itertools
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.rint(df[val].to_numpy() * scale).astype(np.int64)
        work = df[keys].copy()
        for k in keys:
            if (work[k] == marker).any():
                raise ValueError("cube marker collides with data")
        work["__v"] = v
        outs = []
        for r in range(len(keys), -1, -1):
            for sub in itertools.combinations(keys, r):
                gcols = [k for k in keys if k in sub]
                if gcols:
                    agg = work.groupby(gcols, as_index=False).agg(
                        sum_c=("__v", "sum"), n=("__v", "size"))
                else:
                    agg = pd.DataFrame({"sum_c": [int(v.sum())],
                                        "n": [len(v)]})
                for k in keys:
                    if k not in sub:
                        agg[k] = marker
                outs.append(agg[keys + ["sum_c", "n"]])
        out = pd.concat(outs, ignore_index=True)
        out["sum_c"] = out["sum_c"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[:1][keys].copy().reset_index(drop=True)
        out["sum_c"] = np.int64(g["sum_c"].sum())
        out["n"] = np.int64(g["n"].sum())
        return out

    parts = ds.select_columns(keys + [val]).map_batches(
        partial, batch_format="pandas")
    return parts.groupby(keys).map_groups(merge, batch_format="pandas")


def cube_sums_sql(table, keys, val, scale=100, marker=ROLLUP_ALL):
    """DuckDB oracle for :func:`cube_sums` (key columns NULL-free)."""
    if isinstance(keys, str):
        keys = [keys]
    sel = ",\n               ".join(
        f"coalesce({k}, '{marker}') AS {k}" for k in keys)
    return f"""
        SELECT {sel},
               CAST(sum(CAST(round({val} * {scale}) AS BIGINT))
                    AS BIGINT) AS sum_c,
               CAST(count(*) AS BIGINT) AS n
        FROM {table}
        GROUP BY CUBE ({", ".join(keys)})"""


# ---------------------------------------------------------------------------
# breadth-first search: depth-capped shortest hop distance from a seed set

def bfs_levels(edges, seeds, s="s", t="t", node_col="v", max_depth=4,
               width=8):
    """Distributed BFS level assignment — exact hop distance from a
    seed set, depth-capped — over a directed edge list (engine-new;
    the iterative-frontier graph primitive complementing the
    fixed-iteration ``pagerank_iters``). ``edges`` must list every
    traversable arc (emit both directions for an undirected graph);
    ``seeds`` holds the level-0 nodes in ``node_col``.

    Scale shape: the driver sequences the (inherently sequential)
    rounds, but every round's WORK is distributed — the frontier joins
    the partitioned edge table (``hash_join``, both sides large,
    frontier rows deduped per batch by a combiner before the
    exchange), and already-visited nodes are removed with the
    tag-union ``anti_join``; nothing is broadcast or collected to the
    driver except the per-round emptiness check. The edge table is
    materialized once (three+ passes read it); the visited set — the
    output itself — is re-materialized per round (it is the reduced
    node working set, far smaller than whatever produced the graph).
    A drained frontier exits before ``max_depth``.

    Determinism: pure set semantics per level — bit-identical at any
    partitioning. Returns (``node_col``, ``level``) rows with
    level = exact hop distance ≤ ``max_depth``.
    """

    def uniq(col_in, col_out):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                col_out: np.unique(df[col_in].to_numpy(np.int64))})
        return fn

    def global_dedup(ds, col):
        from ray.data.aggregate import Count
        return ds.groupby(col).aggregate(Count()).map_batches(
            lambda df: pd.DataFrame({col: df[col].astype(np.int64)}),
            batch_format="pandas")

    # Block-count discipline: every per-round set (and the edge table
    # itself) is re-bucketed to ``width`` blocks before it feeds the
    # next round. Without this the shuffle width compounds (union adds
    # the shuffle-output block count of every prior round, and each
    # groupby sizes itself off its input block count), so per-round
    # wall time grows ~4x/round even on a 437-node graph. ``width``
    # should scale with frontier size on big graphs (blocks of
    # O(100MB)); the default suits corpus-index-sized node sets.

    def levelled(ds, k):
        return ds.map_batches(
            lambda df, kk=k: pd.DataFrame({node_col: df[node_col],
                                           "level": np.int64(kk)}),
            batch_format="pandas")

    def anti_keys(cand, seen):
        # schema-free single-column anti-join (the generic anti_join
        # introspects left.schema(), which forces an extra execution
        # of the lazy candidate chain every round)
        tag0 = cand.map_batches(
            lambda df: pd.DataFrame({node_col: df[node_col],
                                     "__src": np.int8(0)}),
            batch_format="pandas")
        tag1 = seen.map_batches(
            lambda df: pd.DataFrame({node_col: df[node_col],
                                     "__src": np.int8(1)}),
            batch_format="pandas")

        def keep(g: pd.DataFrame) -> pd.DataFrame:
            if (g["__src"].to_numpy() == 1).any():
                return g.iloc[0:0][[node_col]]
            return g.iloc[:1][[node_col]]

        return tag0.union(tag1).groupby(node_col)\
            .map_groups(keep, batch_format="pandas")

    edges = bounded_blocks(edges, floor=width)
    frontier = bounded_blocks(global_dedup(
        seeds.map_batches(uniq(node_col, node_col),
                          batch_format="pandas"),
        node_col), floor=width)
    # ``visited`` stays a LAZY union over the per-level materialized
    # frontiers: each round's anti_join re-runs only the trivial
    # level-tag maps (one execution per round, not two), and the block
    # count is bounded at width x levels.
    visited = levelled(frontier, 0)
    for k in range(1, max_depth + 1):
        probe = frontier.map_batches(uniq(node_col, s),
                                     batch_format="pandas")
        nbr = hash_join(probe, edges, s, left_cols=[s],
                        right_cols=[t])
        cand = global_dedup(
            nbr.map_batches(uniq(t, node_col), batch_format="pandas"),
            node_col)
        new = bounded_blocks(anti_keys(cand, visited), floor=width)
        if new.count() == 0:
            break
        frontier = new
        visited = visited.union(levelled(new, k))
    return visited


# ---------------------------------------------------------------------------
# capped Bellman-Ford: exact min distance over walks of <= `rounds` hops

def sssp_rounds(edges, seeds, s="s", t="t", w_col="w", node_col="v",
                dist_col="dist", rounds=4, width=8):
    """Distributed single-source (or multi-source) shortest path over a
    weighted directed edge list, Bellman-Ford style: after round k,
    ``dist[v]`` is EXACTLY min over walks from the seed set with <= k
    edges — the fixed-round contract is what makes a distributed SSSP
    SQL-replayable (a recursive CTE enumerating <=k-hop walks) and
    hash-checkable, same discipline as ``pagerank_iters``. Integer
    weights => exact int64 arithmetic, no float-summation hazard.

    Scale shape: each round is ONE dataset execution — the current
    distance table joins the partitioned edge table (``hash_join``,
    both sides large), relaxed candidates union the current table, and
    one ``groupby(node).min`` keeps the best label. Block-count
    discipline as in :func:`bfs_levels`: every per-round table is
    re-bucketed to ``width`` blocks (size it to the node-set scale on
    big graphs). Nothing is collected to the driver.

    ``seeds`` rows need ``node_col`` (distance 0). Returns
    (``node_col``, ``dist_col``) for every node reachable in <=
    ``rounds`` hops.
    """
    from ray.data.aggregate import Min

    def as_dist(ds):
        return ds.map_batches(
            lambda df: pd.DataFrame({
                node_col: df[node_col].to_numpy(np.int64),
                dist_col: np.zeros(len(df), np.int64)}),
            batch_format="pandas")

    def min_by_node(ds):
        return ds.groupby(node_col)\
            .aggregate(Min(dist_col, alias_name=dist_col))\
            .map_batches(
                lambda df: pd.DataFrame({
                    node_col: df[node_col].to_numpy(np.int64),
                    dist_col: df[dist_col].to_numpy(np.int64)}),
                batch_format="pandas")

    edges = bounded_blocks(edges, floor=width)
    dist = bounded_blocks(min_by_node(as_dist(seeds)), floor=width)
    for _k in range(rounds):
        probe = dist.map_batches(
            lambda df: pd.DataFrame({
                s: df[node_col].to_numpy(np.int64),
                "__d": df[dist_col].to_numpy(np.int64)}),
            batch_format="pandas")
        relaxed = hash_join(probe, edges, s, left_cols=["__d"],
                            right_cols=[t, w_col])
        cand = relaxed.map_batches(
            lambda df: pd.DataFrame({
                node_col: df[t].to_numpy(np.int64),
                dist_col: df["__d"].to_numpy(np.int64)
                + df[w_col].to_numpy(np.int64)}),
            batch_format="pandas")
        dist = bounded_blocks(min_by_node(dist.union(cand)),
                              floor=width)
    return dist


def _degree(und):
    """(v, d) degrees of an (s, t) symmetric edge table: per-batch
    count combiner → one groupby(s) merge (one row per node)."""
    from ray.data.aggregate import Sum
    return und.map_batches(
        lambda df: df.groupby("s", as_index=False).size()
        .rename(columns={"s": "v", "size": "d"})
        .astype({"v": "int64", "d": "int64"}),
        batch_format="pandas").groupby("v").aggregate(
        Sum("d", alias_name="d")).map_batches(
        lambda df: df.astype({"v": "int64", "d": "int64"}),
        batch_format="pandas")


def kcore_peel(edges, k=4, rounds=3, a="a", b="b", target_blocks=16):
    """Bounded-round k-core PEELING over an undirected graph given as
    distinct ``a < b`` edges — the degeneracy-ordering primitive
    (community cores, graph sparsification). Exact k-core needs
    graph-diameter cascade depth; the fixed ``rounds`` cap is the
    scale contract (the bfs_levels / sssp_rounds / strahler
    discipline): after R synchronous peel rounds every node is
    classified as peeled-at-round-r (r = 1..R) or still standing with
    its post-peel degree.

    Per round the ONLY exchanges are one degree ``groupby`` (count
    combiner, one row per node) and two node-table semi-joins that
    filter the edge list to survivors — the edge payload itself never
    re-keys. Zero-degree survivors (nodes whose last neighbor was
    peeled) re-enter the next round's candidate table via an
    anti-join of survivor nodes vs the new degree table, so they peel
    in round r+1 exactly as the synchronous semantics require.
    Returns (v, peel_round, deg_final): peel_round 0 = survived,
    deg_final = degree in the final surviving subgraph (0 for peeled
    nodes)."""

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        s = df[a].to_numpy(np.int64)
        t = df[b].to_numpy(np.int64)
        return pd.DataFrame({
            "s": np.concatenate([s, t]),
            "t": np.concatenate([t, s])})

    # each round consumes `und` and `alive` more than once, so both are
    # materialized per round (the reduced working set — same discipline
    # as pagerank_iters / triangle_count); without this Ray Data would
    # recompute the whole upstream DAG once per consumer, exponentially
    # across rounds. They are also REPARTITIONED to ``target_blocks``:
    # the per-round exchanges (sorts, groupbys) schedule per block, so a
    # working set inherited as hundreds of tiny upstream blocks pays
    # hundreds of task launches per barrier — compaction is what keeps
    # the per-round cost proportional to data, not to upstream block
    # count (size target_blocks to the cluster at scale).
    und = bounded_blocks(edges.map_batches(sym, batch_format="pandas"),
                         floor=target_blocks)
    alive = bounded_blocks(_degree(und), floor=target_blocks)
    peeled = []
    for r in range(1, rounds + 1):
        surv = alive.filter(expr=f"d >= {k}")
        rm = alive.filter(expr=f"d < {k}").map_batches(
            lambda df, r=r: pd.DataFrame({
                "v": df["v"].astype("int64"),
                "peel_round": np.full(len(df), r, dtype=np.int64),
                "deg_final": np.zeros(len(df), dtype=np.int64)}),
            batch_format="pandas")
        peeled.append(rm)
        surv_nodes = bounded_blocks(surv.select_columns(["v"]),
                                    floor=target_blocks)
        und = bounded_blocks(
            semi_join(semi_join(und, surv_nodes, "s", right_key="v"),
                      surv_nodes, "t", right_key="v"),
            floor=target_blocks)
        newdeg = bounded_blocks(_degree(und), floor=target_blocks)
        zero = anti_join(surv_nodes, newdeg, "v").map_batches(
            lambda df: pd.DataFrame({
                "v": df["v"].astype("int64"),
                "d": np.zeros(len(df), dtype=np.int64)}),
            batch_format="pandas")
        alive = bounded_blocks(newdeg.union(zero),
                               floor=target_blocks)
    out = alive.map_batches(
        lambda df: pd.DataFrame({
            "v": df["v"].astype("int64"),
            "peel_round": np.zeros(len(df), dtype=np.int64),
            "deg_final": df["d"].astype("int64")}),
        batch_format="pandas")
    for p in peeled:
        out = out.union(p)
    return out


def kcore_sql(edges_cte, k=4, rounds=3):
    """Stacked-CTE DuckDB replay of :func:`kcore_peel`.
    ``edges_cte`` must define a table ``e(a, b)`` of distinct a < b
    edges."""
    parts = [edges_cte,
             "und AS (SELECT a AS s, b AS t FROM e "
             "UNION ALL SELECT b, a FROM e)",
             "a1 AS (SELECT s AS v, count(*) AS d FROM und GROUP BY s)"]
    prev_e, prev_a = "und", "a1"
    sel = []
    for r in range(1, rounds + 1):
        rm, sv, ne, nd, na = (f"rm{r}", f"sv{r}", f"e{r + 1}",
                              f"nd{r + 1}", f"a{r + 1}")
        parts.append(f"{rm} AS (SELECT v FROM {prev_a} WHERE d < {k})")
        parts.append(f"{sv} AS (SELECT v FROM {prev_a} WHERE d >= {k})")
        parts.append(
            f"{ne} AS (SELECT s, t FROM {prev_e} "
            f"WHERE s IN (SELECT v FROM {sv}) "
            f"AND t IN (SELECT v FROM {sv}))")
        parts.append(
            f"{nd} AS (SELECT s AS v, count(*) AS d FROM {ne} "
            f"GROUP BY s)")
        parts.append(
            f"{na} AS (SELECT {sv}.v, coalesce({nd}.d, 0) AS d "
            f"FROM {sv} LEFT JOIN {nd} USING (v))")
        sel.append(f"SELECT v, {r} AS peel_round, 0 AS deg_final "
                   f"FROM {rm}")
        prev_e, prev_a = ne, na
    sel.append(f"SELECT v, 0 AS peel_round, d AS deg_final "
               f"FROM {prev_a}")
    union = " UNION ALL ".join(sel)
    return ("WITH " + ",\n".join(parts)
            + f" SELECT CAST(v AS BIGINT) AS v, "
              f"CAST(peel_round AS BIGINT) AS peel_round, "
              f"CAST(deg_final AS BIGINT) AS deg_final FROM ({union})")


# ---------------------------------------------------------------------------
# bounded-round connected components (hash-to-min label propagation)

def graph_components(edges, rounds=4, a="a", b="b", target_blocks=16):
    """Bounded-round weakly-connected components over an undirected
    graph given as distinct ``a < b`` edges (int64 node ids) — the
    hash-to-min label-propagation primitive (entity-resolution
    clusters, dedup groups, social components). Every node starts
    labelled with its own id; each synchronous round every node takes
    the MIN of its own label and its neighbors' labels. After R
    rounds a node's label is the minimum node id within graph
    distance R — exact components whenever R ≥ diameter, and a
    well-defined bounded-round contract otherwise (the bfs_levels /
    sssp_rounds / kcore_peel discipline; raster components get the
    exact union-find path in stages/label.py, this is the general
    graph-table variant).

    Scale shape per round: ONE partitioned hash join (labels ⨝
    symmetric edges on the source) and ONE groupby(node) min — the
    same message-passing footprint as pagerank_iters; labels are a
    (v, comp) table that never leaves the cluster, and the symmetric
    edge table is materialized once. Returns (v, comp) after R
    rounds."""
    from ray.data.aggregate import Min

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        s = df[a].to_numpy(np.int64)
        t = df[b].to_numpy(np.int64)
        return pd.DataFrame({
            "s": np.concatenate([s, t]),
            "t": np.concatenate([t, s])})

    und = bounded_blocks(edges.map_batches(sym, batch_format="pandas"),
                         floor=target_blocks)
    lab = _degree(und).map_batches(
        lambda df: pd.DataFrame({"v": df["v"].astype("int64"),
                                 "comp": df["v"].astype("int64")}),
        batch_format="pandas")

    for _ in range(rounds):
        msgs = hash_join(und, lab.map_batches(
            lambda df: df.rename(columns={"v": "s"}),
            batch_format="pandas"), "s",
            left_cols=["t"], right_cols=["comp"]).map_batches(
            lambda df: pd.DataFrame({
                "v": df["t"].astype("int64"),
                "comp": df["comp"].astype("int64")})
            .groupby("v", as_index=False).min(),
            batch_format="pandas")
        lab = bounded_blocks(
            lab.union(msgs).groupby("v").aggregate(
                Min("comp", alias_name="comp")).map_batches(
                lambda df: df.astype({"v": "int64", "comp": "int64"}),
                batch_format="pandas"),
            floor=target_blocks)
    return lab


def graph_components_sql(edges_cte, rounds=4):
    """Stacked-CTE DuckDB replay of :func:`graph_components`.
    ``edges_cte`` must define a table ``e(a, b)`` of distinct a < b
    edges."""
    parts = [edges_cte,
             "und AS (SELECT a AS s, b AS t FROM e "
             "UNION ALL SELECT b, a FROM e)",
             "l0 AS (SELECT DISTINCT s AS v, s AS comp FROM und)"]
    prev = "l0"
    for r in range(1, rounds + 1):
        cur = f"l{r}"
        parts.append(
            f"{cur} AS (SELECT v, min(comp) AS comp FROM ("
            f"SELECT u.t AS v, l.comp FROM und u "
            f"JOIN {prev} l ON u.s = l.v "
            f"UNION ALL SELECT v, comp FROM {prev}) GROUP BY v)")
        prev = cur
    return ("WITH " + ",\n".join(parts)
            + f" SELECT CAST(v AS BIGINT) AS v, "
              f"CAST(comp AS BIGINT) AS comp FROM {prev}")


# ---------------------------------------------------------------------------
# per-node clustering coefficient (exact triangle participation)

def clustering_coeff(edges, a="a", b="b"):
    """EXACT per-node local clustering-coefficient INGREDIENTS over an
    undirected graph of distinct ``a < b`` edges: for every node its
    degree, its triangle participation count, and the wedge count
    deg·(deg−1)/2 — the coefficient is n_tri / n_wedge, kept as exact
    int64 ingredients so the distributed result hash-checks against a
    SQL replay (the integer-ingredients discipline used across the
    engine for float-free verification).

    Same degree-ordered wedge-closure core as :func:`triangle_count`
    (count-combiner degrees, two hash-join orientation passes,
    per-source C(outdeg,2) wedges bounded by the √m orientation,
    semi-join closure on a packed pair key) — but the closure keeps
    the wedge apex, decodes the closing pair, and explodes each
    triangle into its 3 member nodes through a count-combiner
    groupby. Returns (v, deg, n_tri, n_wedge) for every node."""
    from ray.data.aggregate import Sum
    edges = edges.materialize()

    def ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "v": np.concatenate([df[a].to_numpy(np.int64),
                                 df[b].to_numpy(np.int64)]),
            "deg": np.int64(1)}).groupby("v", as_index=False).sum()

    deg = edges.map_batches(ends, batch_format="pandas")\
        .groupby("v").aggregate(Sum("deg", alias_name="deg"))\
        .map_batches(lambda df: df.astype({"v": "int64",
                                           "deg": "int64"}),
                     batch_format="pandas").materialize()
    deg_a = deg.map_batches(
        lambda df: pd.DataFrame({a: df["v"], "deg_a": df["deg"]}),
        batch_format="pandas")
    deg_b = deg.map_batches(
        lambda df: pd.DataFrame({b: df["v"], "deg_b": df["deg"]}),
        batch_format="pandas")
    e1 = hash_join(edges, deg_a, a, left_cols=[b], right_cols=["deg_a"])
    e2 = hash_join(e1, deg_b, b, left_cols=[a, "deg_a"],
                   right_cols=["deg_b"])

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        av = df[a].to_numpy(np.int64)
        bv = df[b].to_numpy(np.int64)
        da = df["deg_a"].to_numpy(np.int64)
        db = df["deg_b"].to_numpy(np.int64)
        a_first = (da < db) | ((da == db) & (av < bv))
        return pd.DataFrame({"src": np.where(a_first, av, bv),
                             "dst": np.where(a_first, bv, av)})

    # hash-bucketed wedge groups (not per-source) — see triangle_count
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "src": pd.Series([], dtype="int64"),
                "pk": pd.Series([], dtype="int64")})
        g = g.sort_values(["src", "dst"])
        srcs = g["src"].to_numpy(np.int64)
        dsts = g["dst"].to_numpy(np.int64)
        cuts = np.flatnonzero(np.diff(srcs)) + 1
        out_s, out_p = [], []
        for s0, d in zip(srcs[np.concatenate([[0], cuts])],
                         np.split(dsts, cuts)):
            d = np.unique(d)
            if len(d) < 2:
                continue
            iu, ju = np.triu_indices(len(d), k=1)
            out_s.append(np.full(len(iu), s0, dtype=np.int64))
            out_p.append(d[iu] * (np.int64(1) << 31) + d[ju])
        if not out_s:
            return pd.DataFrame({
                "src": pd.Series([], dtype="int64"),
                "pk": pd.Series([], dtype="int64")})
        return pd.DataFrame({"src": np.concatenate(out_s),
                             "pk": np.concatenate(out_p)})

    w = e2.map_batches(orient, batch_format="pandas")\
        .map_batches(lambda df: df.assign(bk=df["src"] % 256),
                     batch_format="pandas")\
        .groupby("bk").map_groups(wedges, batch_format="pandas")
    ek = edges.map_batches(
        lambda df: pd.DataFrame({
            "pk": df[a].to_numpy(np.int64) * (np.int64(1) << 31)
            + df[b].to_numpy(np.int64)}), batch_format="pandas")
    tri = semi_join(w, ek, "pk")

    def members(df: pd.DataFrame) -> pd.DataFrame:
        pk = df["pk"].to_numpy(np.int64)
        src = df["src"].to_numpy(np.int64)
        lo = pk >> np.int64(31)
        hi = pk & ((np.int64(1) << 31) - 1)
        return pd.DataFrame({
            "v": np.concatenate([src, lo, hi]),
            "n_tri": np.int64(1)}).groupby("v", as_index=False).sum()

    tric = tri.map_batches(members, batch_format="pandas")\
        .groupby("v").aggregate(Sum("n_tri", alias_name="n_tri"))\
        .map_batches(lambda df: df.astype({"v": "int64",
                                           "n_tri": "int64"}),
                     batch_format="pandas")
    joined = hash_join(deg, tric, "v", how="left",
                       left_cols=["deg"], right_cols=["n_tri"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        dg = df["deg"].to_numpy(np.int64)
        nt = pd.to_numeric(df["n_tri"], errors="coerce")\
            .fillna(0).to_numpy(np.int64)
        return pd.DataFrame({
            "v": df["v"].astype("int64"),
            "deg": dg, "n_tri": nt,
            "n_wedge": dg * (dg - 1) // 2})

    return joined.map_batches(final, batch_format="pandas")


def clustering_coeff_sql(edges_cte):
    """DuckDB replay of :func:`clustering_coeff`: exact triangle
    enumeration (a<b<c join chain) exploded to member nodes, LEFT
    JOINed onto the degree table."""
    return ("WITH " + edges_cte + """,
        deg AS (SELECT v, count(*) AS deg FROM (
                  SELECT a AS v FROM e UNION ALL SELECT b FROM e)
                GROUP BY v),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        tm AS (SELECT v, count(*) AS n_tri FROM (
                 SELECT x AS v FROM tri
                 UNION ALL SELECT y FROM tri
                 UNION ALL SELECT z FROM tri) GROUP BY v)
        SELECT CAST(deg.v AS BIGINT) AS v,
               CAST(deg.deg AS BIGINT) AS deg,
               CAST(coalesce(tm.n_tri, 0) AS BIGINT) AS n_tri,
               CAST(deg.deg * (deg.deg - 1) / 2 AS BIGINT) AS n_wedge
        FROM deg LEFT JOIN tm ON tm.v = deg.v""")




# ---------------------------------------------------------------------------
# order-independent table content checksum (replication / migration audit)

CHECKSUM_MOD = (1 << 61) - 1     # Mersenne modulus: sums never overflow


def table_checksum(ds, cols):
    """Order-independent CONTENT CHECKSUM of a table — the
    anti-entropy / migration-audit primitive (verify two replicas or
    an engine port hold the same rows without shipping either): per
    row, the low 60 bits of md5 over the ':'-joined column values;
    the table digest is the SUM of row digests MOD 2^61−1 plus the
    row count. Modular sums are commutative/associative, so the
    digest is identical at any partitioning AND never overflows int64
    at any corpus size (the mod rides every accumulate/merge of the
    aggregate tree); DuckDB replays it exactly (same md5 slice,
    128-bit HUGEINT sum, one final mod).

    One column-pruned pass; per-block digests reduce through Ray's
    aggregate tree — the driver only sees two scalars."""
    import hashlib

    from ray.data.aggregate import AggregateFn

    def acc(state, block):
        df = block.to_pandas() if hasattr(block, "to_pandas") else block
        joined = df[cols[0]].astype(str)
        for c in cols[1:]:
            joined = joined + ":" + df[c].astype(str)
        d = sum(int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
                for v in joined) % CHECKSUM_MOD
        s, n = state
        return ((s + d) % CHECKSUM_MOD, n + len(joined))

    agg = AggregateFn(
        init=lambda k: (0, 0),
        merge=lambda a, b: ((a[0] + b[0]) % CHECKSUM_MOD, a[1] + b[1]),
        accumulate_block=acc,
        name="digest")
    s, n = ds.select_columns(list(cols)).aggregate(agg)["digest"]
    return pd.DataFrame({
        "digest_sum": pd.Series([int(s)], dtype="int64"),
        "n_rows": pd.Series([int(n)], dtype="int64")})


def table_checksum_sql(table, cols):
    expr = " || ':' || ".join("CAST(%s AS VARCHAR)" % c for c in cols)
    return f"""
        SELECT CAST(sum(CAST(CAST('0x' || substr(md5({expr}), 1, 15)
                     AS UBIGINT) AS HUGEINT)) % {CHECKSUM_MOD}
                 AS BIGINT) AS digest_sum,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM {table}"""


def grouped_winsorized(ds, key, col, trim=0.1):
    """Per-key WINSORIZED aggregate — the robust mean for heavy-tail
    corpora (token counts, prices, latencies): values are clipped to
    the key's percentile_disc bounds at q=trim and q=1−trim, and the
    clipped sum is exact int64 (``col`` must be integer). The two
    bounds come from the same distributed-selection core as
    grouped_quantile_disc (so DuckDB quantile_disc reproduces them bit
    for bit); the clipped sum is one more streaming combiner pass
    under the broadcast bounds — the input never sorts and never
    shuffles by value.

    Returns pandas (key, n, lo, hi, wins_sum)."""
    from ray.data.aggregate import Sum

    keys_sorted, n_by_key, values = _grouped_order_stats(
        ds, key, col,
        lambda n: [_disc_rank(n, trim), _disc_rank(n, 1.0 - trim)])
    lo = {kv: int(values[kv][0]) for kv in keys_sorted}
    hi = {kv: int(values[kv][1]) for kv in keys_sorted}

    def clip_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.int64)
        k = df[key]
        lov = k.map(lo).to_numpy(np.int64)
        hiv = k.map(hi).to_numpy(np.int64)
        g = pd.DataFrame({
            key: k.to_numpy(),
            "wins_sum": np.clip(v, lov, hiv),
            "n": np.ones(len(df), dtype=np.int64)})
        return g.groupby(key, as_index=False).sum()

    agg = ds.map_batches(
        lambda t: t.select([key, col]), batch_format="pyarrow") \
        .map_batches(clip_partial, batch_format="pandas") \
        .groupby(key).aggregate(
            Sum("wins_sum", alias_name="wins_sum"),
            Sum("n", alias_name="n")).to_pandas()
    agg = agg.sort_values(key).reset_index(drop=True)
    agg["lo"] = agg[key].map(lo).astype("int64")
    agg["hi"] = agg[key].map(hi).astype("int64")
    agg["n"] = agg["n"].astype("int64")
    agg["wins_sum"] = agg["wins_sum"].astype("int64")
    return agg[[key, "n", "lo", "hi", "wins_sum"]]


def profile_table(ds, columns):
    """ANALYZE-style table profile — the ingest-side data-quality op:
    per column its row count, NULL count, EXACT distinct count, and
    lexicographic min/max (values canonicalized to strings so integer
    and varchar columns share one long-format output; float columns
    are rejected — string forms differ between engines).

    Shape: pass 1 per-batch combiner → (col, n, n_null, min, max)
    partials, ONE groupby(col). Pass 2 exact distinct: per-batch
    per-column value dedup → groupby(col, v) → per-col count (the
    exact path; at corpus scale swap in approx_count_distinct's HLL —
    this operator is the correctness baseline). Returns pandas
    (column, n, n_null, n_distinct, min_v, max_v)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def to_str(s):
        return s.map(lambda v: None if v is None else str(v))

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"column": [], "n": [], "n_null": [], "min_v": [],
                "max_v": []}
        for c in columns:
            if df[c].dtype.kind == "f":
                raise TypeError(
                    f"profile_table refuses float column {c!r}")
            s = to_str(df[c])
            nn = s.isna().sum()
            sv = s.dropna()
            rows["column"].append(c)
            rows["n"].append(len(s))
            rows["n_null"].append(int(nn))
            rows["min_v"].append(sv.min() if len(sv) else None)
            rows["max_v"].append(sv.max() if len(sv) else None)
        return pd.DataFrame(rows)

    stats = ds.select_columns(list(columns)) \
        .map_batches(stats_partial, batch_format="pandas") \
        .groupby("column").aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v")).to_pandas()

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"column": [], "v": []}
        for c in columns:
            for v in to_str(df[c]).dropna().unique():
                rows["column"].append(c)
                rows["v"].append(v)
        return pd.DataFrame(rows)

    dist = ds.select_columns(list(columns)) \
        .map_batches(distinct_partial, batch_format="pandas") \
        .groupby(["column", "v"]).aggregate(
            Count(alias_name="_c")) \
        .groupby("column").aggregate(Count(alias_name="n_distinct")) \
        .to_pandas()

    out = stats.merge(dist[["column", "n_distinct"]], on="column") \
        .sort_values("column").reset_index(drop=True)
    return out[["column", "n", "n_null", "n_distinct", "min_v",
                "max_v"]].astype({"n": "int64", "n_null": "int64",
                                  "n_distinct": "int64"})


def key_skew_audit(ds, key, topk=5):
    """Hot-key skew audit — the pre-shuffle planning op behind every
    salting decision in this engine (stages/shuffle.py,
    composite_by_cell(hot_threshold=...)): exact per-key counts reduce
    to the concentration ingredients a planner needs —

      n_rows, n_keys, sum_c2 = Σ c_k²  (the exact self-join/hash-
      collision size), max_c, and the top-``topk`` hottest keys.

    Shape: per-batch count combiner → ONE groupby(key) → a second
    constant-size ingredient reduce (per-batch partials over the
    count rows) + the grouped-topk pattern for the hot list. All
    exact int64. Returns pandas (stat, k, v) long format: rows
    ('total', '', n_rows), ('keys', '', n_keys), ('sum_c2', '', Σc²),
    ('max_c', '', max), and ('hot', key_str, count) × topk ordered by
    (count desc, key)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, as_index=False).size() \
            .rename(columns={"size": "c"})
        g["c"] = g["c"].astype("int64")
        return g

    counts = ds.select_columns([key]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby(key).aggregate(Sum("c", alias_name="c"))

    def ingredients(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(np.int64)
        top = df.sort_values(["c", key],
                             ascending=[False, True]).head(topk)
        rows = {"stat": ["total", "keys", "sum_c2", "max_c"],
                "k": ["", "", "", ""],
                "v": [int(c.sum()), len(c), int((c * c).sum()),
                      int(c.max()) if len(c) else 0]}
        for _, r in top.iterrows():
            rows["stat"].append("hot")
            rows["k"].append(str(r[key]))
            rows["v"].append(int(r["c"]))
        return pd.DataFrame(rows)

    parts = counts.map_batches(ingredients,
                               batch_format="pandas").to_pandas()
    scal = parts[parts["stat"] != "hot"] \
        .groupby("stat", as_index=False).agg(v=("v", "sum"))
    mx = parts[parts["stat"] == "max_c"]["v"].max()
    scal.loc[scal["stat"] == "max_c", "v"] = mx
    hot = parts[parts["stat"] == "hot"] \
        .sort_values(["v", "k"], ascending=[False, True]).head(topk)
    out = pd.concat([
        scal.assign(k=""),
        hot[["stat", "v"]].assign(k=hot["k"].to_numpy())],
        ignore_index=True)
    return out[["stat", "k", "v"]].astype({"v": "int64"}) \
        .sort_values(["stat", "k"]).reset_index(drop=True)

"""Stream-shaped operators over the events log.

Ray Data has no event-time watermarks (SURVEY.md §2.8); stream semantics
are expressed as ordered, partitioned-log operations: partition by key,
sort by (ts, event_id) within the group, window with pandas
(ray_guide.md "Streaming-shaped workloads"). Deterministic: ordering tie
broken by event_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _per_user_blocks(events, cols, block_fn, key="user_id",
                     order=("ts", "event_id")):
    """Shared exchange shape for the hot per-user operators: ONE
    ``sort(key)`` shuffle (the exact same data movement
    ``groupby(key).map_groups`` performs internally), then WHOLE-BLOCK
    vectorized processing. Ray's sort guarantees a key group is never
    split across output blocks (the invariant map_groups itself relies
    on — ray/data/grouped_data.py "groups are contained in full"), so
    ``block_fn`` receives each block as a DataFrame lexsorted by
    (key, *order) together with the segment start/end index arrays and
    computes EVERY group's output with segmented numpy
    (diff/cumsum/reduceat/searchsorted) — one Python-level call per
    block instead of one per group. At 10^8-key cardinality the
    per-group pandas slice + call costs ~0.4 ms each (VERDICT r03
    item 4); this shape removes that multiplier while keeping
    partitioning, ordering and results identical."""

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        empty = (np.array([], np.int64), np.array([], np.int64))
        if n == 0:
            return block_fn(df, *empty)
        sort_keys = [df[c].to_numpy() for c in order]
        k = df[key].to_numpy()
        if k.dtype == np.dtype(object):  # string keys: lexsort on codes
            k = pd.factorize(k)[0]
        idx = np.lexsort(tuple(reversed([k] + sort_keys)))
        df = df.iloc[idx].reset_index(drop=True)
        k = k[idx]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], np.int64(n)]
        return block_fn(df, starts, ends)

    return events.select_columns(list(cols)).sort(key).map_batches(
        apply, batch_size=None, batch_format="pandas")


def _row_segments(starts, ends):
    """Per-row segment ordinal (0..S-1) for a block cut by
    ``starts``/``ends``."""
    return np.repeat(np.arange(len(starts), dtype=np.int64),
                     ends - starts)


def _seg_searchsorted(vals, vseg, queries, qseg, side, n_seg):
    """Vectorized PER-SEGMENT ``np.searchsorted``: ``vals`` is sorted
    ascending within each segment (``vseg`` non-decreasing), and for
    every ``queries[i]`` (in segment ``qseg[i]``) the result is its
    insertion index RELATIVE to that segment's vals — exactly
    ``np.searchsorted(vals[vseg == s], q, side)`` without a per-segment
    Python call. One merged lexsort + cumsum, O((nv+nq)·log) per block:
    queries tie-break before equal vals for side="left" (count strictly
    less) and after them for side="right" (count less-or-equal)."""
    nv, nq = len(vals), len(queries)
    if nq == 0:
        return np.zeros(0, dtype=np.int64)
    merged = np.concatenate([vals, queries])
    seg = np.concatenate([vseg, qseg])
    isq = np.concatenate([np.zeros(nv, np.int8), np.ones(nq, np.int8)])
    tie = (1 - isq) if side == "left" else isq
    order = np.lexsort((tie, merged, seg))
    isval_o = (isq[order] == 0)
    excl = np.cumsum(isval_o) - isval_o     # vals strictly before pos
    base = np.zeros(n_seg, dtype=np.int64)  # vals in earlier segments
    np.cumsum(np.bincount(vseg, minlength=n_seg)[:-1], out=base[1:])
    rel = excl - base[seg[order]]
    inv = np.empty(nv + nq, dtype=np.int64)
    inv[order] = np.arange(nv + nq)
    return rel[inv[nv:]]


def _seg_base(vseg, n_seg):
    """Exclusive prefix of per-segment val counts: global index of each
    segment's first val in the segment-concatenated val array."""
    base = np.zeros(n_seg, dtype=np.int64)
    np.cumsum(np.bincount(vseg, minlength=n_seg)[:-1], out=base[1:])
    return base


def _ts_us(df, col="ts"):
    """Microseconds regardless of the timestamp unit the block arrived
    with (parquet=us, from_items can surface ns or s)."""
    return df[col].astype("datetime64[us]").astype("int64").to_numpy()


def sessionize(events, gap_s=1800):
    """Gap-based sessionization per user: a new session starts when the
    time since the previous event exceeds ``gap_s``. Returns one row per
    (user_id, session_id): n_events, start_us, end_us (exact ints).

    Scale shape: one sort(user) exchange, then ALL users in a block
    sessionize in one vectorized pass (:func:`_per_user_blocks`) — a
    session boundary is a user change OR a gap, every per-session
    reduction is an index-slice of the sorted block."""
    gap_us = int(gap_s) * 1_000_000

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("user_id", "session_id",
                                           "n_events", "start_us",
                                           "end_us")})
        ts_us = _ts_us(df)
        uid = df["user_id"].to_numpy()
        new_s = np.ones(n, dtype=bool)
        new_s[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts_us) > gap_us)
        b = np.flatnonzero(new_s)               # session start rows
        e = np.r_[b[1:], np.int64(n)]
        gsid = np.cumsum(new_s) - 1             # block-global counter
        ui = np.searchsorted(starts, b, side="right") - 1
        session_id = gsid[b] - gsid[starts][ui]  # 0-based per user
        return pd.DataFrame({
            "user_id": uid[b].astype("int64"),
            "session_id": session_id.astype("int64"),
            "n_events": (e - b).astype("int64"),
            "start_us": ts_us[b],
            "end_us": ts_us[e - 1]})

    return _per_user_blocks(events, ["user_id", "ts", "event_id"],
                            block)


def sessionize_sql(gap_s=1800):
    gap_us = int(gap_s) * 1_000_000
    return f"""
        WITH o AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > {gap_us}
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1
                   AS session_id
          FROM o)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(session_id AS BIGINT) AS session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
               CAST(max(epoch_us(ts)) AS BIGINT) AS end_us
        FROM s GROUP BY user_id, session_id"""


def asof_join(events, left_type="purchase", right_type="click",
              direction="backward", tolerance_us=None):
    """Distributed as-of join over the partitioned event log: for each
    ``left_type`` event, the most recent ``right_type`` event by the
    same user at or before its timestamp (inner semantics: lefts with no
    prior right are dropped). ``direction="forward"`` matches the
    EARLIEST right event strictly after instead (next-action
    attribution); ``tolerance_us`` bounds |lag| in either direction
    (matches beyond it are dropped, ANSI/pandas merge_asof tolerance
    semantics).

    Plan: column-pruned filter to the two event types inside
    ``map_batches`` (nothing else enters the shuffle), ONE ``sort(user)``
    exchange, then a whole-block segmented merge
    (:func:`_per_user_blocks` + :func:`_seg_searchsorted` — no per-user
    Python call). This is the standard key-partitioned merge-join shape
    Ray Data lacks natively (SURVEY.md "custom operators"); at scale
    the shuffle key is the join key and skewed users would salt by time
    range.

    Returns (user_id, event_id, ts_us, matched_ts_us, lag_us) — the
    match is identified by its timestamp (deterministic under ts ties,
    unlike an arbitrary event_id pick).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def prune(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"],
                     value_set=pa.array([left_type, right_type]))
        return t.select(["user_id", "event_id", "ts",
                         "event_type"]).filter(m)

    pruned = events.map_batches(prune, batch_format="pyarrow")
    empty = pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "event_id": pd.Series([], dtype="int64"),
        "ts_us": pd.Series([], dtype="int64"),
        "matched_ts_us": pd.Series([], dtype="int64"),
        "lag_us": pd.Series([], dtype="int64")})

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        if not len(df):
            return empty
        n_seg = len(starts)
        seg = _row_segments(starts, ends)
        ts_us = _ts_us(df)
        is_l = (df["event_type"] == left_type).to_numpy()
        is_r = (df["event_type"] == right_type).to_numpy()
        lt, lseg = ts_us[is_l], seg[is_l]
        rt, rseg = ts_us[is_r], seg[is_r]   # seg-sorted by construction
        if not len(lt) or not len(rt):
            return empty
        rbase = _seg_base(rseg, n_seg)
        rcnt = np.bincount(rseg, minlength=n_seg)
        le = _seg_searchsorted(rt, rseg, lt, lseg, "right", n_seg)
        if direction == "backward":
            pos = le - 1                    # last right ts <= left ts
            ok = pos >= 0
        else:
            pos = le                        # first right ts > left ts
            ok = pos < rcnt[lseg]
        gidx = rbase[lseg] + np.clip(pos, 0, np.maximum(rcnt[lseg], 1)
                                     - 1)
        matched = rt[np.clip(gidx, 0, len(rt) - 1)]
        lag = (lt - matched) if direction == "backward" \
            else (matched - lt)
        if tolerance_us is not None:
            ok &= lag <= int(tolerance_us)
        return pd.DataFrame({
            "user_id": pd.Series(
                df["user_id"].to_numpy()[is_l][ok], dtype="int64"),
            "event_id": pd.Series(
                df["event_id"].to_numpy()[is_l][ok], dtype="int64"),
            "ts_us": pd.Series(lt[ok], dtype="int64"),
            "matched_ts_us": pd.Series(matched[ok], dtype="int64"),
            "lag_us": pd.Series(lag[ok], dtype="int64")})

    return _per_user_blocks(
        pruned, ["user_id", "event_id", "ts", "event_type"], block)


def asof_join_sql(left_type="purchase", right_type="click"):
    return f"""
        SELECT CAST(l.user_id AS BIGINT) AS user_id,
               CAST(l.event_id AS BIGINT) AS event_id,
               CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
               m.matched_ts_us,
               CAST(epoch_us(l.ts) AS BIGINT) - m.matched_ts_us
                 AS lag_us
        FROM events l
        JOIN LATERAL (
          SELECT CAST(max(epoch_us(r.ts)) AS BIGINT) AS matched_ts_us
          FROM events r
          WHERE r.user_id = l.user_id AND r.event_type = '{right_type}'
            AND r.ts <= l.ts) m ON m.matched_ts_us IS NOT NULL
        WHERE l.event_type = '{left_type}'"""


def asof_join_forward_sql(left_type="purchase", right_type="click",
                          tolerance_us=None):
    tol = "" if tolerance_us is None else (
        " AND epoch_us(r.ts) - epoch_us(l.ts) <= %d" % int(tolerance_us))
    return f"""
        SELECT CAST(l.user_id AS BIGINT) AS user_id,
               CAST(l.event_id AS BIGINT) AS event_id,
               CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
               m.matched_ts_us,
               m.matched_ts_us - CAST(epoch_us(l.ts) AS BIGINT)
                 AS lag_us
        FROM events l
        JOIN LATERAL (
          SELECT CAST(min(epoch_us(r.ts)) AS BIGINT) AS matched_ts_us
          FROM events r
          WHERE r.user_id = l.user_id AND r.event_type = '{right_type}'
            AND r.ts > l.ts{tol}) m ON m.matched_ts_us IS NOT NULL
        WHERE l.event_type = '{left_type}'"""


def sliding_window(events, window_s=3600):
    """Trailing sliding-window aggregate per event_type: for every
    event, the count and exact cent-scaled value sum over
    [ts - window_s, ts] — SQL RANGE-frame semantics (timestamp peers
    included on both edges, so ties need no event_id ordering).

    Plan: one ``sort(event_type)`` exchange co-partitions each series;
    prefix sums + two segmented searchsorted passes over the whole block
    (:func:`_per_user_blocks`) give every event's window in O(n log n)
    — no per-event rescan, no per-series Python call. At scale the
    shuffle key is the series key; a single huge series would be
    range-partitioned by time with a window_s overlap (halo) per chunk.

    Returns (event_type, event_id, ts_us, n_in_window, sum_value_c).
    """
    window_us = int(window_s) * 1_000_000

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "event_id": pd.Series([], dtype="int64"),
                "ts_us": pd.Series([], dtype="int64"),
                "n_in_window": pd.Series([], dtype="int64"),
                "sum_value_c": pd.Series([], dtype="int64")})
        n_seg = len(starts)
        seg = _row_segments(starts, ends)
        ts_us = _ts_us(df)
        value_c = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
        pref = np.zeros(len(df) + 1, dtype=np.int64)
        np.cumsum(value_c, out=pref[1:])
        lo = _seg_searchsorted(ts_us, seg, ts_us - window_us, seg,
                               "left", n_seg)
        hi = _seg_searchsorted(ts_us, seg, ts_us, seg, "right", n_seg)
        gbase = starts[seg]   # vals here ARE the block rows
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "event_id": pd.Series(df["event_id"].to_numpy(),
                                  dtype="int64"),
            "ts_us": pd.Series(ts_us, dtype="int64"),
            "n_in_window": pd.Series(hi - lo, dtype="int64"),
            "sum_value_c": pd.Series(pref[gbase + hi] - pref[gbase + lo],
                                     dtype="int64")})

    return _per_user_blocks(
        events, ["event_type", "event_id", "ts", "value"], block,
        key="event_type")


def sliding_window_sql(window_s=3600):
    return f"""
        SELECT event_type, CAST(event_id AS BIGINT) AS event_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               CAST(count(*) OVER w AS BIGINT) AS n_in_window,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                    AS BIGINT) AS sum_value_c
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts
                     RANGE BETWEEN INTERVAL {int(window_s)} SECONDS
                     PRECEDING AND CURRENT ROW)"""


# ---------------------------------------------------------------------------
# per-key window functions (row_number / lag)

def lag_delta(events):
    """Row-level window functions per user: 1-based row number in
    (ts, event_id) order, microsecond gap to the previous event (0 for
    the first), and the previous event's type ('' for the first) — the
    LAG/ROW_NUMBER family, key-partitioned.

    Plan: one ``sort(user_id)`` exchange co-partitions each user's log;
    the whole block then shifts/diffs once with segment resets at user
    boundaries (:func:`_per_user_blocks`). At scale
    the shuffle key is user_id (naturally high-cardinality, no skew
    pre-pass needed); a single pathological user would be range-split
    by time with a 1-row halo.
    """
    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        n = len(df)
        if not n:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "event_id": pd.Series([], dtype="int64"),
                "rn": pd.Series([], dtype="int64"),
                "gap_us": pd.Series([], dtype="int64"),
                "prev_type": pd.Series([], dtype="string")})
        seg = _row_segments(starts, ends)
        ts_us = _ts_us(df)
        first = np.zeros(n, dtype=bool)
        first[starts] = True
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = np.diff(ts_us)
        gap[first] = 0
        et = df["event_type"].to_numpy()
        prev_type = np.empty(n, dtype=object)
        prev_type[0] = ""
        prev_type[1:] = et[:-1]
        prev_type[first] = ""
        rn = np.arange(n, dtype=np.int64) - starts[seg] + 1
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "event_id": pd.Series(df["event_id"].to_numpy(),
                                  dtype="int64"),
            "rn": pd.Series(rn, dtype="int64"),
            "gap_us": pd.Series(gap, dtype="int64"),
            "prev_type": pd.Series(prev_type, dtype="string"),
        })

    return _per_user_blocks(
        events, ["user_id", "event_id", "ts", "event_type"], block)


def lag_delta_sql():
    return """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(event_id AS BIGINT) AS event_id,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER w), 0)
                    AS BIGINT) AS gap_us,
               coalesce(lag(event_type) OVER w, '') AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""


# ---------------------------------------------------------------------------
# interval (range) join

def interval_join(points, intervals, key, ts_col="ts_us",
                  start_col="start_us", end_col="end_us"):
    """Point-in-interval join: each ``points`` row matched to the
    ``intervals`` row of the same ``key`` whose [start, end] contains
    its timestamp. Intervals per key must be non-overlapping (the match
    is unique or absent; unmatched points are dropped).

    The range join Ray Data lacks, expressed without a broadcast — both
    sides may be huge: tag-union the two (column-padded) sides, one
    ``sort(key)`` exchange co-partitions them, and a segmented
    ``searchsorted`` resolves every point in O(log n_intervals) with
    one Python-level call per block.
    Partitioning assumption: one key's intervals + points fit in a
    group (time-range sub-splitting with interval halos otherwise).
    """
    import pyarrow as pa

    def tag_pt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = t[ts_col].cast(pa.int64())
        return pa.table({
            key: t[key],
            "event_id": t["event_id"].cast(pa.int64()),
            ts_col: ts,
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "ord": ts,
            "start_us_r": pa.array(np.zeros(n, dtype=np.int64)),
            "end_us_r": pa.array(np.zeros(n, dtype=np.int64)),
            "session_id_r": pa.array(np.zeros(n, dtype=np.int64))})

    pts = points.select_columns([key, "event_id", ts_col]).map_batches(
        tag_pt, batch_format="pyarrow")

    def tag_iv(t: pa.Table) -> pa.Table:
        n = t.num_rows
        start = t[start_col].cast(pa.int64())
        return pa.table({
            key: t[key],
            "event_id": pa.array(np.full(n, -1, dtype=np.int64)),
            ts_col: pa.array(np.zeros(n, dtype=np.int64)),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "ord": start,
            "start_us_r": start,
            "end_us_r": t[end_col].cast(pa.int64()),
            "session_id_r": t["session_id"].cast(pa.int64())})

    ivs = intervals.map_batches(tag_iv, batch_format="pyarrow")
    empty = pd.DataFrame({
        key: pd.Series([], dtype="int64"),
        "event_id": pd.Series([], dtype="int64"),
        "ts_us": pd.Series([], dtype="int64"),
        "session_id": pd.Series([], dtype="int64")})

    def block(df: pd.DataFrame, bstarts, bends) -> pd.DataFrame:
        if not len(df):
            return empty
        n_seg = len(bstarts)
        seg = _row_segments(bstarts, bends)
        side = df["side"].to_numpy()
        is_iv = side == 1
        is_p = ~is_iv
        ivstart = df["start_us_r"].to_numpy()[is_iv]
        ivend = df["end_us_r"].to_numpy()[is_iv]
        ivsid = df["session_id_r"].to_numpy()[is_iv]
        ivseg = seg[is_iv]
        ts = df[ts_col].to_numpy()[is_p]
        pseg = seg[is_p]
        if not len(ivstart) or not len(ts):
            return empty
        ivbase = _seg_base(ivseg, n_seg)
        ix = _seg_searchsorted(ivstart, ivseg, ts, pseg, "right",
                               n_seg) - 1
        gix = ivbase[pseg] + np.clip(ix, 0, None)
        gix = np.clip(gix, 0, len(ivstart) - 1)
        ok = (ix >= 0) & (ts <= ivend[gix])
        return pd.DataFrame({
            key: pd.Series(df[key].to_numpy()[is_p][ok], dtype="int64"),
            "event_id": pd.Series(df["event_id"].to_numpy()[is_p][ok],
                                  dtype="int64"),
            "ts_us": pd.Series(ts[ok], dtype="int64"),
            "session_id": pd.Series(ivsid[gix[ok]], dtype="int64")})

    return _per_user_blocks(
        pts.union(ivs),
        [key, "event_id", ts_col, "side", "ord", "start_us_r",
         "end_us_r", "session_id_r"],
        block, key=key, order=("side", "ord"))


def session_lookup(events, gap_s=1800, event_type="purchase"):
    """Demo pipeline for :func:`interval_join`: sessionize the full log,
    then range-join the ``event_type`` events back to their enclosing
    session interval. Returns (user_id, event_id, ts_us, session_id)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    sessions = sessionize(events, gap_s=gap_s)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], event_type))
        ts_us = t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"],
                         "ts_us": ts_us})

    pts = events.select_columns(
        ["user_id", "event_id", "ts", "event_type"]).map_batches(
        prep, batch_format="pyarrow")
    return interval_join(pts, sessions, key="user_id")


def session_lookup_sql(gap_s=1800, event_type="purchase"):
    gap_us = int(gap_s) * 1_000_000
    return f"""
        WITH o AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > {gap_us}
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1
                   AS session_id
          FROM o),
        iv AS (
          SELECT user_id, session_id,
                 min(epoch_us(ts)) AS start_us,
                 max(epoch_us(ts)) AS end_us
          FROM s GROUP BY user_id, session_id)
        SELECT CAST(e.user_id AS BIGINT) AS user_id,
               CAST(e.event_id AS BIGINT) AS event_id,
               CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
               CAST(iv.session_id AS BIGINT) AS session_id
        FROM events e
        JOIN iv ON e.user_id = iv.user_id
               AND epoch_us(e.ts) BETWEEN iv.start_us AND iv.end_us
        WHERE e.event_type = '{event_type}'"""


def retention_cohorts(events):
    """Cohort retention analysis — the product-analytics staple over an
    event log: users are cohorted by their FIRST active day, and the
    output counts distinct users of each cohort active on each later
    day (cohort_day, activity_day, n_users).

    Scale shape: a per-batch (user, day) dedup combiner bounds the
    first exchange to one row per (batch, user, active day) — never one
    row per event; groupby(user) merges each user's distinct-day set
    and emits (cohort=min day, day) pairs; a second tiny
    groupby(cohort, day) counts them. Days travel as exact int64
    days-since-epoch (no timestamp/date dtype through the shuffle)."""
    US_PER_DAY = 86_400_000_000

    def dedup_days(df: pd.DataFrame) -> pd.DataFrame:
        days = (df["ts"].astype("datetime64[us]").astype("int64")
                // US_PER_DAY)
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "day": days.astype("int64")}).drop_duplicates()
        return out

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(np.int64)
        day = df["day"].to_numpy(np.int64)
        n = len(df)
        if n == 0:
            return pd.DataFrame({
                "cohort_day": pd.Series([], dtype="int64"),
                "activity_day": pd.Series([], dtype="int64")})
        # distinct (user, day): rows are (user, day)-sorted, so dups
        # are adjacent; cohort = each user's first (min) day
        keep = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        uid, day = uid[keep], day[keep]
        s2 = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        e2 = np.r_[s2[1:], np.int64(len(uid))]
        cohort = np.repeat(day[s2], e2 - s2)
        return pd.DataFrame({"cohort_day": cohort,
                             "activity_day": day})

    pairs = _per_user_blocks(
        events.select_columns(["user_id", "ts"])
        .map_batches(dedup_days, batch_format="pandas"),
        ["user_id", "day"], block, order=("day",))
    counts = pairs.groupby(["cohort_day", "activity_day"]).count()

    def rename(batch):
        import pyarrow as pa
        return pa.table({
            "cohort_day": batch["cohort_day"].cast(pa.int64()),
            "activity_day": batch["activity_day"].cast(pa.int64()),
            "n_users": batch["count()"].cast(pa.int64())})

    return counts.map_batches(rename, batch_format="pyarrow")


def retention_cohorts_sql():
    """DuckDB oracle for :func:`retention_cohorts` (same int64
    days-since-epoch arithmetic)."""
    return """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
          FROM events),
        c AS (SELECT user_id, min(day) AS cohort_day
              FROM ud GROUP BY user_id)
        SELECT c.cohort_day, ud.day AS activity_day,
               CAST(count(*) AS BIGINT) AS n_users
        FROM ud JOIN c USING (user_id)
        GROUP BY c.cohort_day, ud.day"""


def funnel_conversions(events, first="view", then="purchase",
                       gap_s=1800):
    """Within-session funnel conversion per user: a session CONVERTS
    when it contains a ``first`` event at a strictly earlier
    microsecond than some ``then`` event (the product-analytics A→B
    funnel; equal-timestamp pairs do NOT convert — the strict-us
    contract keeps the SQL replay free of tuple-ordering arithmetic).
    Returns (user_id, n_sessions, n_converted).

    Scale shape: same single groupby(user) exchange as
    :func:`sessionize` — conversion is evaluated inside the per-user
    group with vectorized min/max per (session, type), so nothing else
    shuffles."""
    gap_us = int(gap_s) * 1_000_000

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        n = len(df)
        cols = ("user_id", "n_sessions", "n_converted")
        if n == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        ts_us = _ts_us(df)
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        new_s = np.ones(n, dtype=bool)
        new_s[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts_us) > gap_us)
        sid = np.cumsum(new_s) - 1              # block-global session id
        n_sess = int(sid[-1]) + 1
        # per-session min ts of `first` / max ts of `then`: candidate
        # rows are position-sorted and sessions contiguous, so the
        # first/last candidate within each session's run is the answer
        min_a = np.full(n_sess, np.iinfo(np.int64).max, np.int64)
        max_b = np.full(n_sess, np.iinfo(np.int64).min, np.int64)
        ca = np.flatnonzero(et == first)
        if len(ca):
            sa, ia = np.unique(sid[ca], return_index=True)
            min_a[sa] = ts_us[ca][ia]
        cb = np.flatnonzero(et == then)
        if len(cb):
            sb, ib, cnt = np.unique(sid[cb], return_index=True,
                                    return_counts=True)
            max_b[sb] = ts_us[cb][ib + cnt - 1]
        conv = min_a < max_b                    # strict us compare
        # fold sessions back onto users
        sess_user = np.searchsorted(starts, np.flatnonzero(new_s),
                                    side="right") - 1
        n_users = len(starts)
        return pd.DataFrame({
            "user_id": uid[starts],
            "n_sessions": np.bincount(sess_user, minlength=n_users)
            .astype("int64"),
            "n_converted": np.bincount(sess_user, weights=conv,
                                       minlength=n_users)
            .astype("int64")})

    return _per_user_blocks(
        events, ["user_id", "event_id", "ts", "event_type"], block)


def funnel_conversions_sql(first="view", then="purchase", gap_s=1800):
    """DuckDB oracle for :func:`funnel_conversions` (same gap rule
    and strict-microsecond conversion compare)."""
    gap_us = int(gap_s) * 1_000_000
    return f"""
        WITH o AS (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > {gap_us}
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, event_id, ts, event_type,
                 sum(new_s) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1 AS sid
          FROM o),
        conv AS (
          SELECT user_id, sid,
                 CASE WHEN min(CASE WHEN event_type = '{first}'
                          THEN epoch_us(ts) END)
                      < max(CASE WHEN event_type = '{then}'
                          THEN epoch_us(ts) END)
                      THEN 1 ELSE 0 END AS converted
          FROM s GROUP BY user_id, sid)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(converted) AS BIGINT) AS n_converted
        FROM conv GROUP BY user_id"""


def transition_counts(events, gap_s=1800):
    """Within-session event-type transition matrix (Markov sequence
    analytics over the event log): counts of each (prev_type ->
    next_type) adjacent pair in (ts, event_id) order, sessions bounded
    by the same gap rule as :func:`sessionize` (no transition across a
    session break). One groupby(user) exchange; the per-user group
    emits pre-counted (from_type, to_type, n) partials and a tiny
    second groupby merges them — the exchange after the user grouping
    carries at most |types|² rows per user."""
    gap_us = int(gap_s) * 1_000_000

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        n = len(df)
        if n < 2:
            return pd.DataFrame({
                "from_type": pd.Series([], dtype=object),
                "to_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64")})
        ts_us = _ts_us(df)
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        # adjacent pair within the same user AND the same session
        same = (uid[1:] == uid[:-1]) & (np.diff(ts_us) <= gap_us)
        out = pd.DataFrame({"from_type": et[:-1][same],
                            "to_type": et[1:][same]})
        out["n"] = np.int64(1)
        # per-block count combiner: the exchange after this carries at
        # most |types|^2 rows per block
        return out.groupby(["from_type", "to_type"],
                           as_index=False).sum()

    per = _per_user_blocks(
        events, ["user_id", "event_id", "ts", "event_type"], block)
    merged = per.groupby(["from_type", "to_type"]).sum("n")

    def rename(batch):
        import pyarrow as pa
        return pa.table({
            "from_type": batch["from_type"],
            "to_type": batch["to_type"],
            "n": batch["sum(n)"].cast(pa.int64())})

    return merged.map_batches(rename, batch_format="pyarrow")


def transition_counts_sql(gap_s=1800):
    """DuckDB oracle for :func:`transition_counts`."""
    gap_us = int(gap_s) * 1_000_000
    return f"""
        WITH o AS (
          SELECT user_id, event_type, ts,
                 lag(event_type) OVER w AS prev_type,
                 epoch_us(ts) - epoch_us(lag(ts) OVER w) AS dt
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT prev_type AS from_type, event_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM o
        WHERE prev_type IS NOT NULL AND dt <= {gap_us}
        GROUP BY prev_type, event_type"""


def rolling_active_users(events, window_days=7):
    """Trailing-window distinct active users (rolling DAU/WAU — the
    telemetry metric whose DISTINCT defeats plain prefix sums): for
    every window-end day, the count of distinct users active in the
    trailing ``window_days`` days. Composition: (user, day) dedup
    combiner → replicate each pair to its ``window_days`` window-end
    keys (exchange = deduped pairs × window, never events) → the
    engine's exact count-distinct (pair-dedup combiner again on the
    replicated side). Emits only windows that end on an active day AND
    start within the observed span (interior windows), so the result
    is independent of corpus truncation."""
    US_PER_DAY = 86_400_000_000
    from .relational import count_distinct

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        days = (df["ts"].astype("datetime64[us]").astype("int64")
                // US_PER_DAY)
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "day": days.astype("int64")}).drop_duplicates()

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        k = np.arange(window_days, dtype=np.int64)
        u = np.repeat(df["user_id"].to_numpy(), window_days)
        d = np.repeat(df["day"].to_numpy(), window_days)
        return pd.DataFrame({
            "user_id": u,
            "window_end": d + np.tile(k, len(df))}).drop_duplicates()

    dedup = events.select_columns(["user_id", "ts"]) \
        .map_batches(pairs, batch_format="pandas")
    reps = dedup.map_batches(replicate, batch_format="pandas")
    counts = count_distinct(reps, key="window_end", val="user_id",
                            alias="n_users")

    # interior-window trim needs the observed day span: a tiny
    # min/max aggregate (2 scalars to the driver)
    import ray.data
    span = dedup.aggregate(ray.data.aggregate.Min("day"),
                           ray.data.aggregate.Max("day"))
    lo = int(span["min(day)"]) + window_days - 1
    hi = int(span["max(day)"])

    def trim(df: pd.DataFrame) -> pd.DataFrame:
        out = df[(df["window_end"] >= lo) & (df["window_end"] <= hi)]
        return pd.DataFrame({
            "window_end": out["window_end"].astype("int64"),
            "n_users": out["n_users"].astype("int64")})

    return counts.map_batches(trim, batch_format="pandas")


def rolling_active_users_sql(window_days=7):
    """DuckDB oracle for :func:`rolling_active_users`."""
    return f"""
        WITH ud AS (
          SELECT DISTINCT user_id,
                 CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
          FROM events),
        w AS (
          SELECT DISTINCT user_id, day + k AS window_end
          FROM ud, unnest(generate_series(0, {window_days - 1})) t(k))
        SELECT window_end,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM w
        WHERE window_end BETWEEN
              (SELECT min(day) FROM ud) + {window_days - 1}
          AND (SELECT max(day) FROM ud)
        GROUP BY window_end"""


# ---------------------------------------------------------------------------
# per-user daily-count anomaly flags (ops-analytics / abuse-detection
# staple): a user's day is anomalous when its event count deviates
# from that user's mean daily count by more than z population standard
# deviations. The comparison is EXACT integer cross-multiplication —
# (n_d·N − S)² > z²·(N·Q − S²) with N = active days, S = Σn, Q = Σn² —
# so the verdict is hash-identical to the SQL replay (no float sigma).

def user_anomalies(events, z=2, min_days=5):
    """Per (user, active day): event count + anomaly verdict.

    Returns (user_id, day, n_events, is_anomaly); ``day`` is exact
    int64 days-since-epoch. Users with fewer than ``min_days`` active
    days never flag (not enough baseline).

    Scale shape: per-batch (user, day, n) count partials bound the
    exchange to one row per (batch, user, active day) — never one row
    per event; one ``sort(user_id)`` exchange merges each user's day
    profile and the whole block flags EVERY user at once with
    segmented ``np.add.reduceat`` reductions (:func:`_per_user_blocks`
    — a user's active days are bounded by the calendar, so segments
    stay small even at 10^12 events). Guard: raises on int64 overflow of the cross
    products rather than wrapping (multi-year hyperactive keys need
    the two-word accumulation documented in stages/trend.py).
    """
    US_PER_DAY = 86_400_000_000
    z2 = int(z) * int(z)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        days = (df["ts"].astype("datetime64[us]").astype("int64")
                // US_PER_DAY)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "day": days.to_numpy(np.int64)}) \
            .groupby(["user_id", "day"], sort=False).size()
        out = g.reset_index()
        out.columns = ["user_id", "day", "n"]
        out["n"] = out["n"].astype("int64")
        return out

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "day": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "is_anomaly": pd.Series([], dtype=bool)})
        n_seg = len(starts)
        seg = _row_segments(starts, ends)
        dayv = df["day"].to_numpy(np.int64)
        nv = df["n"].to_numpy(np.int64)
        # collapse per (segment, day): rows are (seg, day)-sorted, so
        # each (seg, day) is a contiguous run
        rfirst = np.r_[True, (dayv[1:] != dayv[:-1])
                       | (seg[1:] != seg[:-1])]
        rstart = np.flatnonzero(rfirst)
        n = np.add.reduceat(nv, rstart).astype(np.int64)
        days = dayv[rstart]
        rseg = seg[rstart]
        # per-segment stats over the collapsed day rows
        sfirst = np.r_[True, rseg[1:] != rseg[:-1]]
        sstart = np.flatnonzero(sfirst)
        nd_per = np.diff(np.r_[sstart, len(rstart)]).astype(np.int64)
        s_per = np.add.reduceat(n, sstart).astype(np.int64)
        q_per = np.add.reduceat(n * n, sstart).astype(np.int64)
        nd = np.repeat(nd_per, nd_per)
        s = np.repeat(s_per, nd_per)
        q = np.repeat(q_per, nd_per)
        lhs_f = (n.astype(np.float64) * nd.astype(np.float64)
                 - s.astype(np.float64)) ** 2
        rhs_f = z2 * (nd.astype(np.float64) * q.astype(np.float64)
                      - s.astype(np.float64) ** 2)
        if lhs_f.max(initial=0.0) > 2 ** 62 or \
                np.abs(rhs_f).max(initial=0.0) > 2 ** 62:
            raise OverflowError(
                "user_anomalies: day profile too deep for int64 "
                "cross products")
        d = n * nd - s
        anom = (d * d > z2 * (nd * q - s * s)) & (nd >= min_days)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy()[rstart]
            .astype(np.int64),
            "day": days, "n_events": n, "is_anomaly": anom})

    return _per_user_blocks(
        events.map_batches(partials, batch_format="pandas"),
        ["user_id", "day", "n"], block, order=("day",))


def user_anomalies_sql(z=2, min_days=5):
    """DuckDB oracle for :func:`user_anomalies` (same integer
    cross-multiplication)."""
    z2 = int(z) * int(z)
    return f"""
        WITH ud AS (
          SELECT user_id,
                 CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS nd,
                 CAST(sum(n) AS BIGINT) AS s,
                 CAST(sum(n * n) AS BIGINT) AS q
          FROM ud GROUP BY 1)
        SELECT ud.user_id, ud.day, ud.n_events,
               (st.nd >= {int(min_days)} AND
                (ud.n * st.nd - st.s) * (ud.n * st.nd - st.s)
                  > {z2} * (st.nd * st.q - st.s * st.s)) AS is_anomaly
        FROM (SELECT user_id, day, n, n AS n_events FROM ud) ud
        JOIN st USING (user_id)"""


# ---------------------------------------------------------------------------
# gaps-and-islands: per-user consecutive-day activity streaks

def user_streaks(events, user_col="user_id", ts_col="ts"):
    """Per-user consecutive-day activity streaks — the classic
    gaps-and-islands analysis (engine-new; SQL needs the
    day − row_number() trick, here it is a vectorized diff inside the
    per-user group). Output per user: ``n_days`` (distinct active
    days), ``n_islands`` (maximal consecutive-day runs) and
    ``max_streak`` (longest run, in days).

    Scale shape: per-batch (user, day) dedup is the combiner, then ONE
    ``groupby(user)`` shuffle of the deduped day set (bounded by
    calendar days per user per batch, never by event count); the
    island arithmetic is a sorted-diff split inside the group.
    """

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        day = df[ts_col].to_numpy().astype("datetime64[D]")\
            .astype(np.int64)
        return pd.DataFrame({
            "user_id": df[user_col].astype(np.int64), "day": day,
        }).drop_duplicates()

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        cols = ("user_id", "n_days", "n_islands", "max_streak")
        uid = df["user_id"].to_numpy(np.int64)
        day = df["day"].to_numpy(np.int64)
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        # distinct (user, day) — dups are adjacent in the sorted block
        keep = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        uid, day = uid[keep], day[keep]
        us = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ue = np.r_[us[1:], np.int64(len(uid))]
        # island = maximal run of consecutive days within one user
        new_island = np.r_[True, (uid[1:] != uid[:-1])
                           | (np.diff(day) != 1)]
        ib = np.flatnonzero(new_island)
        il = np.r_[ib[1:], np.int64(len(uid))] - ib     # island lengths
        iu = np.searchsorted(us, ib, side="right") - 1  # island's user
        first_island = np.flatnonzero(np.r_[True, iu[1:] != iu[:-1]])
        return pd.DataFrame({
            "user_id": uid[us],
            "n_days": (ue - us).astype("int64"),
            "n_islands": np.bincount(iu, minlength=len(us))
            .astype("int64"),
            "max_streak": np.maximum.reduceat(il, first_island)
            .astype("int64")})

    return _per_user_blocks(
        events.select_columns([user_col, ts_col]).map_batches(
            dedup, batch_format="pandas"),
        ["user_id", "day"], block, order=("day",))


def user_streaks_sql():
    """DuckDB oracle: the day − row_number() islands trick."""
    return """
        WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                   FROM events),
        i AS (SELECT user_id, day,
                     day - row_number() OVER (PARTITION BY user_id
                                              ORDER BY day)
                       * INTERVAL 1 DAY AS grp
              FROM d),
        s AS (SELECT user_id, grp, count(*) AS len
              FROM i GROUP BY user_id, grp)
        SELECT user_id,
               CAST(sum(len) AS BIGINT) AS n_days,
               CAST(count(*) AS BIGINT) AS n_islands,
               CAST(max(len) AS BIGINT) AS max_streak
        FROM s GROUP BY user_id"""


# ---------------------------------------------------------------------------
# time-weighted average (TWAP): value held until the next observation

def time_weighted_avg(events, user_col="user_id", ts_col="ts",
                      val_col="value", id_col="event_id"):
    """Per-user time-weighted average ingredients — each observation's
    value is held until the user's next event (the standard TWAP /
    sensor-resample rule). Output per user: ``twap_num`` =
    Σ value_cents·Δt_µs, ``twap_den`` = Σ Δt_µs, ``n_intervals`` — all
    exact int64 (value fixed-pointed to cents, time in µs; Σ v·Δt is
    bounded by max_cents · user-activity-span, ~1e18 at 1e5-cent
    values over months, inside int64), so the SQL window replay (lead
    over (user ORDER BY ts, id)) hash-matches exactly. Users with a
    single event emit (0, 0, 0).

    Scale shape: one ``groupby(user)`` shuffle of the projected
    columns; per-group mergesort + vectorized diff/product.
    """

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        cols = ("user_id", "twap_num", "twap_den", "n_intervals")
        n = len(df)
        if n == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        t = _ts_us(df, ts_col)
        uid = df[user_col].to_numpy(np.int64)
        cents = np.rint(df[val_col].to_numpy(np.float64) * 100)\
            .astype(np.int64)
        # interval i = (row i, row i+1); valid only within one user —
        # zero the user-boundary interval and reduceat over segments
        # (row i's interval always belongs to row i's user, so the
        # per-user sum is an exact segmented reduction; the trailing
        # pad keeps reduceat indices in range for a user whose segment
        # starts at the block's last row)
        valid = np.r_[uid[1:] == uid[:-1], False]
        dt = np.r_[np.diff(t), np.int64(0)]
        dt[~valid] = 0
        return pd.DataFrame({
            "user_id": uid[starts],
            "twap_num": np.add.reduceat(cents * dt, starts)
            .astype("int64"),
            "twap_den": np.add.reduceat(dt, starts).astype("int64"),
            "n_intervals": np.add.reduceat(
                valid.astype(np.int64), starts).astype("int64")})

    return _per_user_blocks(
        events, [user_col, ts_col, val_col, id_col], block,
        key=user_col, order=(ts_col, id_col))


def time_weighted_avg_sql():
    """DuckDB oracle: lead() window with the identical integer math."""
    return """
        WITH w AS (
          SELECT user_id,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 epoch_us(ts) AS t,
                 lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                   AS t_next
          FROM events)
        SELECT user_id,
               CAST(COALESCE(sum(cents * (t_next - t)), 0) AS BIGINT)
                 AS twap_num,
               CAST(COALESCE(sum(t_next - t), 0) AS BIGINT)
                 AS twap_den,
               CAST(count(t_next) AS BIGINT) AS n_intervals
        FROM w GROUP BY user_id"""


# ---------------------------------------------------------------------------
# ordered sequence matching (MATCH_RECOGNIZE-lite): does a session
# contain the steps as a subsequence?

def sequence_match(events, steps=("view", "click", "purchase"),
                   gap_s=1800):
    """Per-session ordered funnel over ANY number of steps — the
    strict-subsequence pattern match (each step strictly after the
    previous one, other events may interleave; the
    MATCH_RECOGNIZE-lite every funnel tool implements). Output one row
    per session that contains the FULL sequence: user, session index,
    and the microsecond timestamp of each matched step under the
    GREEDY (earliest-feasible) strategy — leftmost match of step 1,
    then earliest later step 2, etc. Greedy is the unique minimal
    match, so the output is deterministic and SQL-replayable (chained
    min-over-window subqueries).

    Scale shape: one ``groupby(user)`` shuffle of the projected
    columns (type + µs only); sessionization and the subsequence scan
    are vectorized per group — one ``searchsorted`` pass per step, no
    Python loop over events.
    """
    steps = list(steps)
    gap_us = int(gap_s) * 1_000_000

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        cast = {"user_id": "int64", "session_idx": "int64",
                **{"t_step%d" % si: "int64"
                   for si in range(len(steps))}}
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {k: pd.Series([], dtype="int64") for k in cast})
        t = _ts_us(df)
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        new_s = np.ones(n, dtype=bool)
        new_s[1:] = (uid[1:] != uid[:-1]) | (np.diff(t) > gap_us)
        sid = np.cumsum(new_s) - 1              # block-global session
        n_sess = int(sid[-1]) + 1
        # greedy subsequence scan, ALL sessions at once, one vectorized
        # pass per step: candidates are position-sorted with sessions
        # contiguous, so each session's earliest valid candidate is the
        # first row of its candidate run; the "after" relation is
        # STRICT TIME (not position), matching the SQL replay's
        # x.t > t_prev under timestamp ties
        NEG = np.iinfo(np.int64).min
        cur_t = np.full(n_sess, NEG, np.int64)
        alive = np.ones(n_sess, dtype=bool)
        hits = np.empty((len(steps), n_sess), np.int64)
        for si, step in enumerate(steps):
            c = np.flatnonzero(et == step)
            c = c[(t[c] > cur_t[sid[c]]) & alive[sid[c]]]
            hit_s, first = np.unique(sid[c], return_index=True)
            got = np.zeros(n_sess, dtype=bool)
            got[hit_s] = True
            cur_t[hit_s] = t[c][first]
            hits[si, hit_s] = t[c][first]
            alive &= got
        # session index 0-based within its user
        sb = np.flatnonzero(new_s)              # session start rows
        su = np.searchsorted(starts, sb, side="right") - 1
        gsid = np.arange(n_sess)
        sess_idx = gsid - gsid[np.searchsorted(sb, starts)][su]
        keep = np.flatnonzero(alive)
        out = {"user_id": uid[sb][keep],
               "session_idx": sess_idx[keep]}
        for si in range(len(steps)):
            out["t_step%d" % si] = hits[si, keep]
        return pd.DataFrame(out).astype(cast)

    return _per_user_blocks(
        events, ["user_id", "ts", "event_id", "event_type"], block)


def sequence_match_sql(steps=("view", "click", "purchase"),
                       gap_s=1800):
    """DuckDB oracle: sessionize with the islands trick, then chain
    greedy earliest-feasible picks as correlated min() subqueries."""
    steps = list(steps)
    sess = f"""
        WITH o AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
                 CASE WHEN epoch_us(ts)
                           - lag(epoch_us(ts)) OVER (
                               PARTITION BY user_id
                               ORDER BY ts, event_id)
                           > {int(gap_s) * 1_000_000}
                      THEN 1 ELSE 0 END AS brk
          FROM events),
        s AS (
          SELECT user_id, event_id, event_type, t,
                 sum(brk) OVER (PARTITION BY user_id
                                ORDER BY t, event_id) AS session_idx
          FROM o)"""
    if len(steps) != 3:
        raise ValueError("oracle emitted for exactly 3 steps")
    a, b, c = steps
    return sess + f""",
        p0 AS (
          SELECT user_id, session_idx,
                 min(CASE WHEN event_type = '{a}' THEN t END)
                   AS t_step0
          FROM s GROUP BY user_id, session_idx),
        p1 AS (
          SELECT s.user_id, s.session_idx, p0.t_step0,
                 min(CASE WHEN s.event_type = '{b}'
                          AND s.t > p0.t_step0 THEN s.t END)
                   AS t_step1
          FROM s JOIN p0 ON p0.user_id = s.user_id
                        AND p0.session_idx = s.session_idx
          WHERE p0.t_step0 IS NOT NULL
          GROUP BY s.user_id, s.session_idx, p0.t_step0),
        p2 AS (
          SELECT s.user_id, s.session_idx, p1.t_step0, p1.t_step1,
                 min(CASE WHEN s.event_type = '{c}'
                          AND s.t > p1.t_step1 THEN s.t END)
                   AS t_step2
          FROM s JOIN p1 ON p1.user_id = s.user_id
                        AND p1.session_idx = s.session_idx
          WHERE p1.t_step1 IS NOT NULL
          GROUP BY s.user_id, s.session_idx, p1.t_step0, p1.t_step1)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(session_idx AS BIGINT) AS session_idx,
               CAST(t_step0 AS BIGINT) AS t_step0,
               CAST(t_step1 AS BIGINT) AS t_step1,
               CAST(t_step2 AS BIGINT) AS t_step2
        FROM p2 WHERE t_step2 IS NOT NULL"""


def range_window_sum(events, window_s=300, alias_n="n_in_window",
                     alias_sum="sum_cents_w"):
    """ANSI RANGE-frame windowed aggregate over event TIME (the frame
    family member the engine lacked: ROWS frames are
    orders_moving_window, hopping windows events_sliding — a RANGE
    frame bounds by VALUE distance, here the trailing ``window_s``
    seconds per user, peers-at-equal-ts included, exactly SQL's
    ``RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT ROW``): for
    every event, the count and exact cent-sum of the same user's
    events inside the trailing window.

    Plan: ONE ``sort(user_id)`` exchange, then prefix-sum + two
    segmented searchsorted passes over the whole block — O(n log n)
    total, no per-row rescans and no per-user Python call; the exchange
    carries (user, ts, cents, event_id) only. Skewed users would salt
    by time range with a window_s overlap."""

    w_us = int(window_s) * 1_000_000

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                alias_n: pd.Series([], dtype="int64"),
                alias_sum: pd.Series([], dtype="int64")})
        n_seg = len(starts)
        seg = _row_segments(starts, ends)
        ts = _ts_us(df)
        cents = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(cents)])
        lo = _seg_searchsorted(ts, seg, ts - w_us, seg, "left", n_seg)
        hi = _seg_searchsorted(ts, seg, ts, seg, "right", n_seg)
        gbase = starts[seg]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            alias_n: (hi - lo).astype(np.int64),
            alias_sum: cum[gbase + hi] - cum[gbase + lo]})

    return _per_user_blocks(
        events, ["user_id", "event_id", "ts", "value"], block)


def range_window_sum_sql(window_s=300):
    return f"""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(count(*) OVER w AS BIGINT) AS n_in_window,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                    AS BIGINT) AS sum_cents_w
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL {window_s} SECONDS
                           PRECEDING AND CURRENT ROW)"""


def asof_interpolate(events, probe_type="purchase",
                     sample_type="click"):
    """As-of LINEAR INTERPOLATION (the time-series resampling
    primitive: sensor alignment, price marking, gap fill at query
    points): for each ``probe_type`` event, the same user's bracketing
    ``sample_type`` values — prev = latest sample at-or-before, next =
    earliest strictly-after — interpolated at the probe time as an
    EXACT rational: num = v_prev·(t_next − t) + v_next·(t − t_prev)
    cents·µs over den = t_next − t_prev µs (one-sided probes fall back
    to the available side with den = 1). Duplicate sample timestamps
    resolve deterministically to the max cent value. The float value
    is num/den — postprocessing the caller does; the distributed
    result stays integer and hash-checks.

    Plan: same shape as :func:`asof_join` — type prune inside
    ``map_batches``, ONE ``sort(user)`` exchange, whole-block segmented
    searchsorted brackets (:func:`_per_user_blocks`)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def prune(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"],
                     value_set=pa.array([probe_type, sample_type]))
        return t.select(["user_id", "event_id", "ts", "event_type",
                         "value"]).filter(m)

    pruned = events.map_batches(prune, batch_format="pyarrow")
    empty = {
        "user_id": pd.Series([], dtype="int64"),
        "event_id": pd.Series([], dtype="int64"),
        "ts_us": pd.Series([], dtype="int64"),
        "num_cents_us": pd.Series([], dtype="int64"),
        "den_us": pd.Series([], dtype="int64"),
        "status": pd.Series([], dtype=object)}

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(empty)
        n_seg = len(starts)
        seg = _row_segments(starts, ends)
        ts_us = _ts_us(df)
        cents = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
        is_p = (df["event_type"] == probe_type).to_numpy()
        is_s = (df["event_type"] == sample_type).to_numpy()
        pt, pseg = ts_us[is_p], seg[is_p]
        st, sv, sseg = ts_us[is_s], cents[is_s], seg[is_s]
        if not len(pt) or not len(st):
            return pd.DataFrame(empty)
        # max cents per (segment, ts): keep last of each run
        order = np.lexsort((sv, st, sseg))
        st, sv, sseg = st[order], sv[order], sseg[order]
        last = np.r_[(st[1:] != st[:-1]) | (sseg[1:] != sseg[:-1]),
                     True]
        st, sv, sseg = st[last], sv[last], sseg[last]
        sbase = _seg_base(sseg, n_seg)
        scnt = np.bincount(sseg, minlength=n_seg)
        ip = _seg_searchsorted(st, sseg, pt, pseg, "right", n_seg) - 1
        inx = ip + 1
        has_p = ip >= 0
        has_n = inx < scnt[pseg]
        hi = len(st) - 1
        gp = np.clip(sbase[pseg] + np.clip(ip, 0, None), 0, hi)
        gn = np.clip(sbase[pseg] + inx, 0, hi)
        tp, vp = st[gp], sv[gp]
        tn, vn = st[gn], sv[gn]
        num = np.where(
            has_p & has_n, vp * (tn - pt) + vn * (pt - tp),
            np.where(has_p, vp, vn))
        den = np.where(has_p & has_n, tn - tp, np.int64(1))
        status = np.where(has_p & has_n, "both",
                          np.where(has_p, "prev", "next"))
        keep = has_p | has_n
        return pd.DataFrame({
            "user_id": pd.Series(df["user_id"].to_numpy()[is_p][keep],
                                 dtype="int64"),
            "event_id": pd.Series(df["event_id"].to_numpy()[is_p][keep],
                                  dtype="int64"),
            "ts_us": pd.Series(pt[keep], dtype="int64"),
            "num_cents_us": pd.Series(num[keep], dtype="int64"),
            "den_us": pd.Series(den[keep], dtype="int64"),
            "status": status[keep]})

    return _per_user_blocks(
        pruned, ["user_id", "event_id", "ts", "event_type", "value"],
        block)


def asof_interpolate_sql(probe_type="purchase", sample_type="click"):
    return f"""
        WITH s AS (
          SELECT user_id, epoch_us(ts) AS t,
                 CAST(round(value * 100) AS BIGINT) AS v
          FROM events WHERE event_type = '{sample_type}'),
        p AS (
          SELECT user_id, event_id, epoch_us(ts) AS t
          FROM events WHERE event_type = '{probe_type}')
        SELECT CAST(p.user_id AS BIGINT) AS user_id,
               CAST(p.event_id AS BIGINT) AS event_id,
               CAST(p.t AS BIGINT) AS ts_us,
               CAST(CASE
                 WHEN pv.t IS NOT NULL AND nx.t IS NOT NULL THEN
                   pv.v * (nx.t - p.t) + nx.v * (p.t - pv.t)
                 WHEN pv.t IS NOT NULL THEN pv.v ELSE nx.v END
                 AS BIGINT) AS num_cents_us,
               CAST(CASE
                 WHEN pv.t IS NOT NULL AND nx.t IS NOT NULL
                   THEN nx.t - pv.t ELSE 1 END AS BIGINT) AS den_us,
               CASE WHEN pv.t IS NOT NULL AND nx.t IS NOT NULL
                    THEN 'both' WHEN pv.t IS NOT NULL THEN 'prev'
                    ELSE 'next' END AS status
        FROM p
        LEFT JOIN LATERAL (
          SELECT s.t, s.v FROM s
          WHERE s.user_id = p.user_id AND s.t <= p.t
          ORDER BY s.t DESC, s.v DESC LIMIT 1) pv ON true
        LEFT JOIN LATERAL (
          SELECT s.t, s.v FROM s
          WHERE s.user_id = p.user_id AND s.t > p.t
          ORDER BY s.t ASC, s.v DESC LIMIT 1) nx ON true
        WHERE pv.t IS NOT NULL OR nx.t IS NOT NULL"""


def trending_types(events, window_s=3600, k=3):
    """Windowed trending top-k (the 'trending hashtags' shape): per
    tumbling ``window_s`` window, the ``k`` most frequent event types
    with the deterministic (count DESC, type ASC) tiebreak.
    Composition of the engine's primitives: per-batch (window, type)
    count combiner → ONE groupby merge → grouped_topk (which itself
    pre-truncates to k rows per key per batch before its shuffle)."""
    from ray.data.aggregate import Sum

    from .relational import grouped_topk

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        win = (df["ts"].astype("datetime64[us]").astype("int64")
               // (window_s * 1_000_000))
        g = pd.DataFrame({"win": win.astype("int64"),
                          "event_type": df["event_type"]}) \
            .groupby(["win", "event_type"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    counts = events.select_columns(["ts", "event_type"]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby(["win", "event_type"]).aggregate(
            Sum("n", alias_name="n")) \
        .map_batches(lambda df: df.astype({"win": "int64",
                                           "n": "int64"}),
                     batch_format="pandas")
    return grouped_topk(counts, ["win"], "n", k,
                        tiebreak=("event_type",))


def trending_types_sql(window_s=3600, k=3):
    return f"""
        WITH c AS (
          SELECT epoch_us(ts) // {window_s * 1_000_000} AS win,
                 event_type, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        r AS (SELECT win, event_type, n,
                     row_number() OVER (PARTITION BY win
                       ORDER BY n DESC, event_type) AS rank
              FROM c)
        SELECT CAST(win AS BIGINT) AS win, event_type, n,
               CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= {k}"""


def session_overlap(events, type_a="view", type_b="click", gap_s=1800):
    """Interval-overlap self-join: per user, gap-sessionize the
    ``type_a`` stream and the ``type_b`` stream SEPARATELY, then emit
    every (a-session, b-session) pair whose closed intervals overlap
    ([as,ae] ∩ [bs,be] ≠ ∅), with the exact overlap length in µs.

    This is the 1-D interval join Ray Data lacks natively (the temporal
    analogue of box_intersection_join): the only exchange is ONE
    sort(user_id) over the two pruned event types — the join key
    co-locates both interval sets, and within a user both session lists
    are disjoint and sorted (gap sessionization ⇒ session k+1 starts
    after session k ends), so overlapping pairs are a contiguous
    segmented-searchsorted range per a-interval (the whole block
    sessionizes and sweeps in one vectorized pass via
    :func:`_per_user_blocks`): rights with start ≤ a_end and
    end ≥ a_start. Per-user cost O((na+nb)·log + pairs); a hot user
    would salt by time range with a gap_s boundary halo.

    Returns (user_id, a_session, b_session, a_start_us, b_start_us,
    overlap_us) — overlap_us ≥ 0, 0 meaning the intervals touch at a
    single shared microsecond (closed-interval semantics: equal
    endpoints count, matching the SQL a_start <= b_end AND
    b_start <= a_end predicate).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    gap_us = int(gap_s) * 1_000_000

    def prune(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"],
                     value_set=pa.array([type_a, type_b]))
        return t.select(["user_id", "event_id", "ts",
                         "event_type"]).filter(m)

    pruned = events.map_batches(prune, batch_format="pyarrow")

    empty = pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "a_session": pd.Series([], dtype="int64"),
        "b_session": pd.Series([], dtype="int64"),
        "a_start_us": pd.Series([], dtype="int64"),
        "b_start_us": pd.Series([], dtype="int64"),
        "overlap_us": pd.Series([], dtype="int64")})

    def _seg_sessions(ts, seg, n_seg):
        """Gap-sessionize one type's (segment-contiguous, ts-sorted)
        subset: per-segment 0-based session ids plus (start, end, seg)
        arrays — sessions are disjoint and start-sorted within each
        segment by construction."""
        if not len(ts):
            z = np.zeros(0, dtype=np.int64)
            return z, z, z, z
        new_s = np.ones(len(ts), dtype=bool)
        new_s[1:] = (seg[1:] != seg[:-1]) | (np.diff(ts) > gap_us)
        b = np.flatnonzero(new_s)
        e = np.r_[b[1:], np.int64(len(ts))]
        sseg = seg[b]
        sid = np.arange(len(b), dtype=np.int64) \
            - _seg_base(sseg, n_seg)[sseg]
        return sid, ts[b], ts[e - 1], sseg

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        if not len(df):
            return empty
        n_seg = len(starts)
        seg = _row_segments(starts, ends)
        ts_us = _ts_us(df)
        seg_uid = df["user_id"].to_numpy()[starts]
        is_a = (df["event_type"] == type_a).to_numpy()
        is_b = (df["event_type"] == type_b).to_numpy()
        aid, astart, aend, aseg = _seg_sessions(ts_us[is_a], seg[is_a],
                                                n_seg)
        bid, bstart, bend, bseg = _seg_sessions(ts_us[is_b], seg[is_b],
                                                n_seg)
        if not len(aid) or not len(bid):
            return empty
        # b-sessions overlapping [as, ae]: bstart <= ae AND bend >= as;
        # bstart and bend are both sorted within a segment (disjoint
        # sorted intervals), so the matches are a contiguous range
        hi = _seg_searchsorted(bstart, bseg, aend, aseg, "right", n_seg)
        lo = _seg_searchsorted(bend, bseg, astart, aseg, "left", n_seg)
        cnt = np.maximum(hi - lo, 0)
        tot = int(cnt.sum())
        if not tot:
            return empty
        ai = np.repeat(np.arange(len(aid)), cnt)
        bbase = _seg_base(bseg, n_seg)
        bi = (np.arange(tot) -
              np.repeat(np.cumsum(cnt) - cnt, cnt) +
              np.repeat(bbase[aseg] + lo, cnt))
        ov = (np.minimum(aend[ai], bend[bi]) -
              np.maximum(astart[ai], bstart[bi]))
        return pd.DataFrame({
            "user_id": pd.Series(seg_uid[aseg[ai]], dtype="int64"),
            "a_session": aid[ai], "b_session": bid[bi],
            "a_start_us": astart[ai], "b_start_us": bstart[bi],
            "overlap_us": ov.astype(np.int64)})

    return _per_user_blocks(
        pruned, ["user_id", "event_id", "ts", "event_type"], block)


def _session_cte(name, typ, gap_us):
    """Gap-sessionization of one event type as SQL CTE fragments."""
    return f"""
        {name}_o AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > {gap_us}
                      THEN 1 ELSE 0 END AS new_s
          FROM events WHERE event_type = '{typ}'
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        {name}_s AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1 AS sid
          FROM {name}_o),
        {name} AS (
          SELECT user_id, sid,
                 CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
                 CAST(max(epoch_us(ts)) AS BIGINT) AS end_us
          FROM {name}_s GROUP BY user_id, sid)"""


def session_overlap_sql(type_a="view", type_b="click", gap_s=1800):
    gap_us = int(gap_s) * 1_000_000
    return f"""
        WITH {_session_cte('sa', type_a, gap_us)},
        {_session_cte('sb', type_b, gap_us)}
        SELECT CAST(a.user_id AS BIGINT) AS user_id,
               CAST(a.sid AS BIGINT) AS a_session,
               CAST(b.sid AS BIGINT) AS b_session,
               a.start_us AS a_start_us, b.start_us AS b_start_us,
               CAST(least(a.end_us, b.end_us)
                    - greatest(a.start_us, b.start_us) AS BIGINT)
                 AS overlap_us
        FROM sa a JOIN sb b
          ON a.user_id = b.user_id
         AND a.start_us <= b.end_us AND b.start_us <= a.end_us"""


def window_join(events, left_type="purchase", right_type="click",
                window_s=86400):
    """Stream-stream WINDOW join: every (left, right) event pair by
    the same user within ±``window_s`` — the all-matches companion of
    :func:`asof_join` (which keeps only the nearest) and the classic
    interval-bounded stream join (Spark's stream-stream inner join /
    Flink's interval join shape).

    Plan: prune to the two event types inside ``map_batches``, ONE
    ``sort(user)`` exchange co-partitioning both sides, then a
    whole-block segmented pair sweep: each left's matches are the
    contiguous per-segment searchsorted range
    [ts−W, ts+W] — O((nl+nr)·log + pairs). Emits exact lag_us
    (right − left, negative = right before left); deterministic
    because pairs are identified by event ids.

    Returns (user_id, event_id, matched_id, lag_us)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    w_us = int(window_s) * 1_000_000

    def prune(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"],
                     value_set=pa.array([left_type, right_type]))
        return t.select(["user_id", "event_id", "ts",
                         "event_type"]).filter(m)

    pruned = events.map_batches(prune, batch_format="pyarrow")
    empty = pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "event_id": pd.Series([], dtype="int64"),
        "matched_id": pd.Series([], dtype="int64"),
        "lag_us": pd.Series([], dtype="int64")})

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        if not len(df):
            return empty
        n_seg = len(starts)
        seg = _row_segments(starts, ends)
        ts_us = _ts_us(df)
        eid = df["event_id"].to_numpy(np.int64)
        seg_uid = df["user_id"].to_numpy()[starts]
        is_l = (df["event_type"] == left_type).to_numpy()
        is_r = (df["event_type"] == right_type).to_numpy()
        lt, lid, lseg = ts_us[is_l], eid[is_l], seg[is_l]
        rt, rid, rseg = ts_us[is_r], eid[is_r], seg[is_r]
        if not len(lt) or not len(rt):
            return empty
        lo = _seg_searchsorted(rt, rseg, lt - w_us, lseg, "left", n_seg)
        hi = _seg_searchsorted(rt, rseg, lt + w_us, lseg, "right",
                               n_seg)
        cnt = hi - lo
        tot = int(cnt.sum())
        if not tot:
            return empty
        rbase = _seg_base(rseg, n_seg)
        li = np.repeat(np.arange(len(lt)), cnt)
        ri = (np.arange(tot) -
              np.repeat(np.cumsum(cnt) - cnt, cnt) +
              np.repeat(rbase[lseg] + lo, cnt))
        return pd.DataFrame({
            "user_id": pd.Series(seg_uid[lseg[li]], dtype="int64"),
            "event_id": lid[li],
            "matched_id": rid[ri],
            "lag_us": (rt[ri] - lt[li]).astype(np.int64)})

    return _per_user_blocks(
        pruned, ["user_id", "event_id", "ts", "event_type"], block)


def window_join_sql(left_type="purchase", right_type="click",
                    window_s=86400):
    w_us = int(window_s) * 1_000_000
    return f"""
        SELECT CAST(l.user_id AS BIGINT) AS user_id,
               CAST(l.event_id AS BIGINT) AS event_id,
               CAST(r.event_id AS BIGINT) AS matched_id,
               CAST(epoch_us(r.ts) - epoch_us(l.ts) AS BIGINT)
                 AS lag_us
        FROM events l JOIN events r
          ON l.user_id = r.user_id
         AND l.event_type = '{left_type}'
         AND r.event_type = '{right_type}'
         AND epoch_us(r.ts) >= epoch_us(l.ts) - {w_us}
         AND epoch_us(r.ts) <= epoch_us(l.ts) + {w_us}"""


def daily_locf(events, scale=100):
    """Date-spine gap fill with last-observation-carried-forward — the
    warehouse 'resample to a regular daily grid' op (composite_cube's
    forward fill, lifted from rasters to the event log): one row per
    (user, day) from the user's first active day to the corpus's last
    day, carrying the user's most recent value (exact fixed-point
    cents; within a day the last event by (ts, event_id) wins — the
    deterministic duplicate-resolution contract asof_interpolate
    uses).

    Scale shape: one tiny max(ts) pass fixes the spine end; the only
    exchange is ONE ``sort(user_id)`` over (ts, event_id, value) rows;
    the whole block then reduces to per-(user, day) last values and
    fills every user's spine with one segmented searchsorted
    (:func:`_per_user_blocks`) — O(days + events log events) total,
    and the output is bounded by users × days, not events."""
    day_us = 86_400_000_000
    gmax_day = (int(pd.Timestamp(events.max("ts")).value // 1000)
                // day_us)

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        n = len(df)
        if not n:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "day": pd.Series([], dtype="int64"),
                "value_cents": pd.Series([], dtype="int64")})
        n_seg = len(starts)
        seg = _row_segments(starts, ends)
        ts_us = _ts_us(df)
        day = ts_us // day_us
        cents = np.rint(df["value"].to_numpy(np.float64) * scale) \
            .astype(np.int64)
        # last value per (segment, day) = last row of each run
        last = np.r_[(day[1:] != day[:-1]) | (seg[1:] != seg[:-1]),
                     True]
        dday, dval, dseg = day[last], cents[last], seg[last]
        dbase = _seg_base(dseg, n_seg)
        # per-segment spine: first active day .. corpus max day
        first_day = dday[dbase]
        lens = gmax_day + 1 - first_day
        tot = int(lens.sum())
        sseg = np.repeat(np.arange(n_seg, dtype=np.int64), lens)
        spine = (np.arange(tot, dtype=np.int64)
                 - np.repeat(np.cumsum(lens) - lens, lens)
                 + np.repeat(first_day, lens))
        idx = _seg_searchsorted(dday, dseg, spine, sseg, "right",
                                n_seg) - 1
        seg_uid = df["user_id"].to_numpy()[starts].astype(np.int64)
        return pd.DataFrame({
            "user_id": seg_uid[sseg],
            "day": spine,
            "value_cents": dval[dbase[sseg] + idx]})

    return _per_user_blocks(events, ["user_id", "event_id", "ts",
                                     "value"], block)


def daily_locf_sql(scale=100):
    day_us = 86_400_000_000
    return f"""
        WITH e AS (
          SELECT user_id, epoch_us(ts) // {day_us} AS day,
                 CAST(round(value * {scale}) AS BIGINT) AS v,
                 row_number() OVER (
                   PARTITION BY user_id, epoch_us(ts) // {day_us}
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events),
        d AS (SELECT user_id, day, v FROM e WHERE rn = 1),
        mm AS (SELECT max(epoch_us(ts)) // {day_us} AS gmax
               FROM events),
        u AS (SELECT user_id, min(day) AS d0 FROM d GROUP BY user_id),
        spine AS (
          SELECT u.user_id, gs.day
          FROM u, mm, unnest(generate_series(u.d0, mm.gmax))
            AS gs(day))
        SELECT CAST(s.user_id AS BIGINT) AS user_id,
               CAST(s.day AS BIGINT) AS day,
               CAST((SELECT v FROM d
                     WHERE d.user_id = s.user_id AND d.day <= s.day
                     ORDER BY d.day DESC LIMIT 1) AS BIGINT)
                 AS value_cents
        FROM spine s"""


def decay_score(events, half_life_days=1, max_age_days=20):
    """Per-user recency-weighted activity score with EXACT power-of-two
    decay: each event contributes 2^(max_age_days − age_days) where
    age_days = floor((anchor − ts)/1 day) and anchor = the corpus's max
    timestamp; events older than ``max_age_days`` contribute exactly 0.

    The decay-by-halving makes the score an exact int64 (a sum of
    powers of two — no float exp/log ever enters the distributed
    reduce, so batching order cannot matter and the SQL replay is
    hash-exact). One tiny max(ts) pass fixes the anchor; scoring is a
    per-batch count combiner + one groupby(user_id) sum. The int64
    envelope holds for < 2^43 events per user at max_age 20.

    Returns (user_id, score, n_live, n_expired)."""
    from ray.data.aggregate import Sum

    anchor_us = int(pd.Timestamp(events.max("ts")).value // 1000)
    day_us = 86_400_000_000
    mx = int(max_age_days)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        age = (anchor_us - ts_us) // day_us
        live = age <= mx
        contrib = np.where(live, np.int64(1) << np.minimum(
            np.maximum(mx - age, 0), mx).astype(np.int64), 0)
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "score": contrib.astype(np.int64),
            "n_live": live.astype(np.int64),
            "n_expired": (~live).astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()
        return g.astype({"score": "int64", "n_live": "int64",
                         "n_expired": "int64"})

    out = events.select_columns(["ts", "user_id"]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("user_id").aggregate(
            Sum("score", alias_name="score"),
            Sum("n_live", alias_name="n_live"),
            Sum("n_expired", alias_name="n_expired"))
    return out.map_batches(
        lambda df: df.astype({"user_id": "int64", "score": "int64",
                              "n_live": "int64", "n_expired": "int64"}),
        batch_format="pandas")


def decay_score_sql(half_life_days=1, max_age_days=20):
    mx = int(max_age_days)
    return f"""
        WITH a AS (SELECT max(epoch_us(ts)) AS anchor FROM events),
        e AS (
          SELECT user_id,
                 (a.anchor - epoch_us(ts)) // 86400000000 AS age
          FROM events, a)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(sum(CASE WHEN age <= {mx}
                             THEN 1::BIGINT << ({mx} - age)
                             ELSE 0 END) AS BIGINT) AS score,
               CAST(sum(CASE WHEN age <= {mx} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_live,
               CAST(sum(CASE WHEN age > {mx} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_expired
        FROM e GROUP BY user_id"""


def scd2_intervals(events, attr="event_type"):
    """Type-2 slowly-changing-dimension build from the event log: for
    each user, the validity intervals of their ``attr`` value —
    consecutive events with the same value collapse into one versioned
    row ``[valid_from_us, valid_to_us)`` where ``valid_to_us`` is the
    next version's start (−1 on the open current version). The
    dimension-table construction step of a warehouse ingest (the
    storage-side sibling of snapshot_diff's CDC statuses).

    Shape: ONE ``sort(user_id)`` exchange co-locates each user's
    events; the run-length collapse is vectorized over the WHOLE
    (user, ts, event_id)-sorted block with segment resets
    (:func:`_per_user_blocks`; event_id breaks timestamp ties
    deterministically, the same ORDER BY the SQL replay uses). Output
    is bounded by the number of value CHANGES, never the event count.
    Exact int64 microsecond bounds — hash-checkable.

    Returns (user_id, value, version, valid_from_us, valid_to_us,
    n_events, is_current)."""

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        n = len(df)
        if not n:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "value": pd.Series([], dtype=object),
                "version": pd.Series([], dtype="int64"),
                "valid_from_us": pd.Series([], dtype="int64"),
                "valid_to_us": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "is_current": pd.Series([], dtype="int64")})
        seg = _row_segments(starts, ends)
        ts_us = _ts_us(df)
        val = df[attr].to_numpy()
        chg = np.ones(n, dtype=bool)
        chg[1:] = (val[1:] != val[:-1]) | (seg[1:] != seg[:-1])
        rstart = np.flatnonzero(chg)
        n_runs = len(rstart)
        rseg = seg[rstart]
        counts = np.diff(np.append(rstart, n))
        vfrom = ts_us[rstart]
        # per-segment 1-based versions + interval ends (-1 on the
        # segment's last/open version)
        seg_first = np.r_[True, rseg[1:] != rseg[:-1]]
        ver = np.arange(n_runs, dtype=np.int64) \
            - np.repeat(np.flatnonzero(seg_first),
                        np.diff(np.r_[np.flatnonzero(seg_first),
                                      n_runs])) + 1
        last_of_seg = np.r_[rseg[1:] != rseg[:-1], True]
        vto = np.empty(n_runs, dtype=np.int64)
        vto[:-1] = vfrom[1:]
        vto[last_of_seg] = -1
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy()[rstart]
            .astype(np.int64),
            "value": val[rstart],
            "version": ver,
            "valid_from_us": vfrom,
            "valid_to_us": vto,
            "n_events": counts.astype(np.int64),
            "is_current": last_of_seg.astype(np.int64)})

    return _per_user_blocks(events, ["user_id", "ts", "event_id", attr],
                            block)


def scd2_intervals_sql(attr="event_type"):
    return f"""
        WITH e AS (
          SELECT user_id, {attr} AS value, epoch_us(ts) AS ts_us,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        f AS (
          SELECT *, CASE WHEN lag(value) OVER (
                     PARTITION BY user_id ORDER BY rn) = value
                     THEN 0 ELSE 1 END AS chg
          FROM e),
        g AS (
          SELECT *, sum(chg) OVER (PARTITION BY user_id
                                   ORDER BY rn) AS ver
          FROM f),
        h AS (
          SELECT user_id, value, ver, min(ts_us) AS valid_from_us,
                 count(*) AS n_events
          FROM g GROUP BY 1, 2, 3)
        SELECT CAST(user_id AS BIGINT) AS user_id, value,
               CAST(ver AS BIGINT) AS version,
               CAST(valid_from_us AS BIGINT) AS valid_from_us,
               CAST(coalesce(lead(valid_from_us) OVER (
                    PARTITION BY user_id ORDER BY ver), -1)
                    AS BIGINT) AS valid_to_us,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(CASE WHEN lead(valid_from_us) OVER (
                    PARTITION BY user_id ORDER BY ver) IS NULL
                    THEN 1 ELSE 0 END AS BIGINT) AS is_current
        FROM h"""


# fixed-point day-of-week DFT weights: floor(10^6 · cos/sin(2πp/7)).
# Hardcoded LITERALS (not computed at runtime) so the engine and the
# SQL replay share byte-identical integer constants.
_DOW_COS = (1000000, 623489, -222521, -900969,
            -900969, -222521, 623489)
_DOW_SIN = (0, 781831, 974927, 433883, -433884, -974928, -781832)


def seasonality_score(events):
    """Per-event-type weekday-seasonality ingredients: the exact
    fixed-point DFT bin at period 7 over the day-of-week event counts.
    With c_p = events of the type on weekday p (p = epoch-day mod 7),

        s_cos = Σ_p c_p · W_COS[p],   s_sin = Σ_p c_p · W_SIN[p]

    where W are the floor(10^6·cos/sin(2πp/7)) integer literals above —
    the spectral power s_cos² + s_sin² (a driver/SQL postprocessing of
    the two ingredients) is high iff the type's activity concentrates
    on particular weekdays. No float trig enters the distributed
    reduce: the weights are integer constants, so the sum is exact
    int64 at any batching (envelope: |s| ≤ 10^6·n — scale the weights
    down at >2^43-event corpora).

    One per-batch count combiner → ONE groupby(event_type).
    Returns (event_type, n, s_cos, s_sin)."""
    from ray.data.aggregate import Sum

    wc = np.array(_DOW_COS, dtype=np.int64)
    ws = np.array(_DOW_SIN, dtype=np.int64)
    day_us = 86_400_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        p = (ts_us // day_us) % 7
        g = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "n": np.ones(len(df), dtype=np.int64),
            "s_cos": wc[p],
            "s_sin": ws[p]}).groupby("event_type",
                                     as_index=False).sum()
        return g.astype({"n": "int64", "s_cos": "int64",
                         "s_sin": "int64"})

    out = events.select_columns(["ts", "event_type"]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"),
            Sum("s_cos", alias_name="s_cos"),
            Sum("s_sin", alias_name="s_sin"))
    return out.map_batches(
        lambda df: df.astype({"n": "int64", "s_cos": "int64",
                              "s_sin": "int64"}),
        batch_format="pandas")


def seasonality_score_sql():
    wrows = ", ".join(
        "(%d, %d, %d)" % (p, _DOW_COS[p], _DOW_SIN[p])
        for p in range(7))
    return f"""
        WITH w(p, wc, wsn) AS (VALUES {wrows}),
        e AS (
          SELECT event_type,
                 (epoch_us(ts) // 86400000000) % 7 AS p
          FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(w.wc) AS BIGINT) AS s_cos,
               CAST(sum(w.wsn) AS BIGINT) AS s_sin
        FROM e JOIN w ON w.p = e.p
        GROUP BY event_type"""


def json_prop_stats(events, bucket=10):
    """Semi-structured property extraction + rollup: parse the JSON
    ``props`` payload (the event log's schemaless tail every real
    pipeline drags along), extract the numeric ``k`` property, and
    aggregate exact (n, k_sum, k_min, k_max) per (event_type,
    k // bucket). Parsing is per-batch stdlib json over the string
    column (no shuffle cost — the exchange carries only the combined
    per-bucket partials through ONE groupby). Rows whose props lack a
    numeric ``k`` are counted per type in a parallel ``n_bad`` bucket
    (-1) rather than dropped silently.

    Oracle: DuckDB json_extract replay."""
    import json as _json

    from ray.data.aggregate import Max, Min, Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks = np.empty(len(df), dtype=np.int64)
        ok = np.zeros(len(df), dtype=bool)
        for i, s in enumerate(df["props"]):
            try:
                v = _json.loads(s).get("k")
                if isinstance(v, int):
                    ks[i] = v
                    ok[i] = True
            except (ValueError, TypeError, AttributeError):
                pass
        b = np.where(ok, ks // bucket, -1)
        g = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "kb": b,
            "n": np.ones(len(df), dtype=np.int64),
            "k_sum": np.where(ok, ks, 0),
            "k_min": np.where(ok, ks, np.iinfo(np.int64).max),
            "k_max": np.where(ok, ks, np.iinfo(np.int64).min)})
        return g.groupby(["event_type", "kb"], as_index=False).agg(
            n=("n", "sum"), k_sum=("k_sum", "sum"),
            k_min=("k_min", "min"), k_max=("k_max", "max"))

    out = events.select_columns(["event_type", "props"]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby(["event_type", "kb"]).aggregate(
            Sum("n", alias_name="n"),
            Sum("k_sum", alias_name="k_sum"),
            Min("k_min", alias_name="k_min"),
            Max("k_max", alias_name="k_max"))
    return out.map_batches(
        lambda df: df.astype({"kb": "int64", "n": "int64",
                              "k_sum": "int64", "k_min": "int64",
                              "k_max": "int64"}),
        batch_format="pandas")


def json_prop_stats_sql(bucket=10):
    return f"""
        WITH e AS (
          SELECT event_type,
                 TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS k
          FROM events)
        SELECT event_type,
               CAST(CASE WHEN k IS NULL THEN -1
                    ELSE k // {bucket} END AS BIGINT) AS kb,
               CAST(count(*) AS BIGINT) AS n,
               CAST(coalesce(sum(k), 0) AS BIGINT) AS k_sum,
               CAST(coalesce(min(k), 9223372036854775807) AS BIGINT)
                 AS k_min,
               CAST(coalesce(max(k), -9223372036854775808) AS BIGINT)
                 AS k_max
        FROM e GROUP BY 1, 2"""


def attribution(events, probe_type="purchase", touch_type="click",
                window_s=86_400, scale=720_720):
    """Multi-touch attribution: every ``probe_type`` event splits one
    unit of credit EVENLY across the same user's ``touch_type`` events
    in the trailing window. Credit is exact fixed point —
    floor(scale / n_touches) per touch (the default scale 720720 =
    lcm(1..16) divides evenly for every realistic touch count) — so
    the distributed sum is int64-exact and SQL-replayable. Probes with
    zero touches are reported in the 'unattributed' row.

    Shape: ONE ``sort(user_id)`` exchange co-locates each user's
    events; the whole block then runs a segmented searchsorted range
    sweep (:func:`_per_user_blocks`) counting touches per probe and
    credit per touch — the window_join machinery specialized to
    aggregated credits (never materializing the pair rows), combined
    per day inside the block before the final groupby(day). Returns
    per day-of-probe (day, n_probes, n_unattributed, credit_sum)."""
    from ray.data.aggregate import Sum

    day_us = 86_400_000_000
    w_us = int(window_s) * 1_000_000

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        empty = pd.DataFrame({
            "day": pd.Series([], dtype="int64"),
            "n_probes": pd.Series([], dtype="int64"),
            "n_unattributed": pd.Series([], dtype="int64"),
            "credit_sum": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        n_seg = len(starts)
        seg = _row_segments(starts, ends)
        ts = _ts_us(df)
        et = df["event_type"].to_numpy()
        is_p = et == probe_type
        is_t = et == touch_type
        pt, pseg = ts[is_p], seg[is_p]
        tt, tseg = ts[is_t], seg[is_t]
        if not len(pt):
            return empty
        lo = _seg_searchsorted(tt, tseg, pt - w_us, pseg, "left",
                               n_seg)
        hi = _seg_searchsorted(tt, tseg, pt, pseg, "right", n_seg)
        n_touch = hi - lo
        credit = np.where(n_touch > 0,
                          (scale // np.maximum(n_touch, 1)) * n_touch,
                          0)
        out = pd.DataFrame({
            "day": pt // day_us,
            "n_probes": np.ones(len(pt), dtype=np.int64),
            "n_unattributed": (n_touch == 0).astype(np.int64),
            "credit_sum": credit.astype(np.int64)})
        return out.groupby("day", as_index=False).sum()

    out = _per_user_blocks(events, ["user_id", "ts", "event_type"],
                           block, order=("ts",)) \
        .groupby("day").aggregate(
            Sum("n_probes", alias_name="n_probes"),
            Sum("n_unattributed", alias_name="n_unattributed"),
            Sum("credit_sum", alias_name="credit_sum"))
    return out.map_batches(
        lambda df: df.astype({"day": "int64", "n_probes": "int64",
                              "n_unattributed": "int64",
                              "credit_sum": "int64"}),
        batch_format="pandas")


def attribution_sql(probe_type="purchase", touch_type="click",
                    window_s=86_400, scale=720_720):
    w_us = int(window_s) * 1_000_000
    return f"""
        WITH p AS (
          SELECT user_id, epoch_us(ts) AS pts
          FROM events WHERE event_type = '{probe_type}'),
        t AS (
          SELECT user_id, epoch_us(ts) AS tts
          FROM events WHERE event_type = '{touch_type}'),
        n AS (
          SELECT p.user_id, p.pts,
                 (SELECT count(*) FROM t
                  WHERE t.user_id = p.user_id
                    AND t.tts >= p.pts - {w_us}
                    AND t.tts <= p.pts) AS n_touch
          FROM p)
        SELECT CAST(pts // 86400000000 AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n_probes,
               CAST(sum(CASE WHEN n_touch = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unattributed,
               CAST(sum(CASE WHEN n_touch > 0
                        THEN ({scale} // n_touch) * n_touch
                        ELSE 0 END) AS BIGINT) AS credit_sum
        FROM n GROUP BY day"""


def interarrival_hist(events):
    """Inter-arrival-time histogram with EXACT log2 buckets: per user
    the gap to the previous event (any type, (ts, event_id) order),
    attributed to the later event's type, bucketed by bit_length(gap_us)
    — the doubling-bucket latency histogram (Prometheus-style) with no
    float log anywhere: numpy ``frexp`` exponent on one side (exact
    for integers < 2^53), ``length(printf('%b', g))`` on the SQL side.
    First events per user are excluded; zero gaps land in bucket 0.

    ONE groupby(user_id) + per-batch count combiner + ONE tiny
    groupby(event_type, bucket). Returns (event_type, bucket, n,
    gap_sum)."""
    from ray.data.aggregate import Sum

    def block(df: pd.DataFrame, starts, ends) -> pd.DataFrame:
        n = len(df)
        if n < 2:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "bucket": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "gap_sum": pd.Series([], dtype="int64")})
        ts_us = _ts_us(df)
        uid = df["user_id"].to_numpy(np.int64)
        same = uid[1:] == uid[:-1]              # same-user adjacency
        gaps = np.diff(ts_us)[same]
        et = df["event_type"].to_numpy()[1:][same]
        assert (gaps >= 0).all() and (gaps < (1 << 53)).all()
        _m, ex = np.frexp(gaps.astype(np.float64))
        bucket = np.where(gaps == 0, 0, ex).astype(np.int64)
        out = pd.DataFrame({
            "event_type": et, "bucket": bucket,
            "n": np.ones(len(et), dtype=np.int64),
            "gap_sum": gaps})
        return out.groupby(["event_type", "bucket"],
                           as_index=False).sum()

    out = _per_user_blocks(
        events, ["user_id", "ts", "event_id", "event_type"], block) \
        .groupby(["event_type", "bucket"]).aggregate(
            Sum("n", alias_name="n"),
            Sum("gap_sum", alias_name="gap_sum"))
    return out.map_batches(
        lambda df: df.astype({"bucket": "int64", "n": "int64",
                              "gap_sum": "int64"}),
        batch_format="pandas")


def interarrival_hist_sql():
    return """
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                 lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
          FROM events),
        g AS (SELECT event_type, ts_us - prev AS gap
              FROM e WHERE prev IS NOT NULL)
        SELECT event_type,
               CAST(CASE WHEN gap = 0 THEN 0
                    ELSE length(printf('%b', gap)) END AS BIGINT)
                 AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(gap) AS BIGINT) AS gap_sum
        FROM g GROUP BY 1, 2"""

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


def sessionize(events, gap_s=1800):
    """Gap-based sessionization per user: a new session starts when the
    time since the previous event exceeds ``gap_s``. Returns one row per
    (user_id, session_id): n_events, start_us, end_us (exact ints)."""
    gap_us = int(gap_s) * 1_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        # normalize to microseconds regardless of the timestamp unit the
        # block arrived with (parquet=us, from_items can surface ns or s)
        ts_us = g["ts"].astype("datetime64[us]").astype("int64")\
            .to_numpy()
        new_session = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new_session[1:] = (np.diff(ts_us) > gap_us).astype(np.int64)
        session_id = np.cumsum(new_session) - 1
        out = pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "session_id": session_id,
            "ts_us": ts_us,
        })
        agg = out.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("ts_us", "size"), start_us=("ts_us", "min"),
            end_us=("ts_us", "max"))
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg

    return events.groupby("user_id").map_groups(
        per_user, batch_format="pandas")


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

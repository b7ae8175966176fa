"""Batching-adversarial checks for the vectorized per-user events ops
(_per_user_blocks, VERDICT r03 item 4): every op must produce identical
results when each user's rows are scattered across many input blocks —
the sort(key) exchange plus whole-block segmented-numpy processing must
reassemble users exactly the way groupby(user).map_groups did."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages import events as ev


def _log(n_users=40, ev_per=12, seed=3):
    rng = np.random.default_rng(seed)
    n = n_users * ev_per
    df = pd.DataFrame({
        "user_id": np.repeat(np.arange(n_users, dtype=np.int64), ev_per),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 40 * 86_400, n) * 1_000_000, unit="us"),
        "event_type": rng.choice(["view", "click", "purchase"], n),
        "value": np.round(rng.normal(10, 3, n), 2),
    })
    # adversarial scatter: round-robin users across blocks so every
    # block holds a slice of every user
    return df.sample(frac=1.0, random_state=1).reset_index(drop=True)


@pytest.mark.parametrize("nblocks", [1, 17])
def test_sessionize_scattered_blocks(ray_session, nblocks):
    df = _log()
    ds = ray.data.from_pandas(np.array_split(df, nblocks))
    got = ev.sessionize(ds).to_pandas().sort_values(
        ["user_id", "session_id"]).reset_index(drop=True)
    # pandas reference
    rows = []
    gap_us = 1800 * 1_000_000
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        new_s = np.r_[True, np.diff(t) > gap_us]
        sid = np.cumsum(new_s) - 1
        for s in range(sid[-1] + 1):
            m = sid == s
            rows.append((uid, s, int(m.sum()), int(t[m].min()),
                         int(t[m].max())))
    want = pd.DataFrame(rows, columns=["user_id", "session_id",
                                       "n_events", "start_us",
                                       "end_us"])
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64"))


@pytest.mark.parametrize("nblocks", [1, 17])
def test_twap_scattered_blocks(ray_session, nblocks):
    df = _log()
    ds = ray.data.from_pandas(np.array_split(df, nblocks))
    got = ev.time_weighted_avg(ds).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        cents = np.rint(g["value"].to_numpy(np.float64) * 100)\
            .astype(np.int64)
        dt = np.diff(t)
        rows.append((uid, int((cents[:-1] * dt).sum()), int(dt.sum()),
                     len(t) - 1))
    want = pd.DataFrame(rows, columns=["user_id", "twap_num",
                                       "twap_den", "n_intervals"])
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64"))


@pytest.mark.parametrize("nblocks", [1, 17])
def test_streaks_scattered_blocks(ray_session, nblocks):
    df = _log()
    ds = ray.data.from_pandas(np.array_split(df, nblocks))
    got = ev.user_streaks(ds).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    rows = []
    for uid, g in df.groupby("user_id"):
        days = np.unique(
            g["ts"].to_numpy().astype("datetime64[D]").astype(np.int64))
        cuts = np.nonzero(np.diff(days) > 1)[0]
        starts = np.r_[0, cuts + 1]
        lens = np.r_[cuts, len(days) - 1] - starts + 1
        rows.append((uid, len(days), len(lens), int(lens.max())))
    want = pd.DataFrame(rows, columns=["user_id", "n_days",
                                       "n_islands", "max_streak"])
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64"))


@pytest.mark.parametrize("nblocks", [1, 17])
def test_funnel_scattered_blocks(ray_session, nblocks):
    df = _log()
    ds = ray.data.from_pandas(np.array_split(df, nblocks))
    got = ev.funnel_conversions(ds).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    gap_us = 1800 * 1_000_000
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        et = g["event_type"].to_numpy()
        sid = np.cumsum(np.r_[True, np.diff(t) > gap_us]) - 1
        conv = 0
        for s in range(sid[-1] + 1):
            m = sid == s
            a, b = m & (et == "view"), m & (et == "purchase")
            if a.any() and b.any() and t[a].min() < t[b].max():
                conv += 1
        rows.append((uid, sid[-1] + 1, conv))
    want = pd.DataFrame(rows, columns=["user_id", "n_sessions",
                                       "n_converted"])
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64"))

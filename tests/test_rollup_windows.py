"""Unit tests for the round-3 window-function / interval-join /
grouping-sets / cell-rollup operators."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from unmixing_ray import cellindex
from unmixing_ray.stages import events as ev
from unmixing_ray.stages import relational, rollup


def _events_df(n=400, seed=3):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2026-01-01").value // 1000 \
        + np.sort(rng.integers(0, 3 * 86400 * 10**6, n))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.integers(0, 7, n).astype(np.int64),
        "event_type": rng.choice(["click", "view", "purchase"], n),
        "value": np.round(rng.uniform(0, 50, n), 2),
    })


def test_lag_delta_matches_pandas(ray_session):
    df = _events_df()
    got = ev.lag_delta(ray.data.from_pandas(df)).to_pandas()
    got = got.sort_values(["user_id", "rn"]).reset_index(drop=True)
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        mine = got[got["user_id"] == uid]
        assert list(mine["event_id"]) == list(g["event_id"])
        ts_us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        want_gap = np.concatenate([[0], np.diff(ts_us)])
        assert np.array_equal(mine["gap_us"].to_numpy(), want_gap)
        assert mine["prev_type"].iloc[0] == ""
        assert list(mine["prev_type"].iloc[1:]) == \
            list(g["event_type"].iloc[:-1])


def test_interval_join_drops_unmatched(ray_session):
    # intervals [0,10], [20,30] for user 1; points at 5 (in), 15 (gap),
    # 25 (in), and user 2 has no intervals at all
    pts = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
        "event_id": np.array([10, 11, 12, 13], dtype=np.int64),
        "ts_us": np.array([5, 15, 25, 5], dtype=np.int64)})
    ivs = pd.DataFrame({
        "user_id": np.array([1, 1], dtype=np.int64),
        "session_id": np.array([0, 1], dtype=np.int64),
        "start_us": np.array([0, 20], dtype=np.int64),
        "end_us": np.array([10, 30], dtype=np.int64)})
    out = ev.interval_join(
        ray.data.from_pandas(pts), ray.data.from_pandas(ivs),
        key="user_id").to_pandas().sort_values("event_id")
    assert list(out["event_id"]) == [10, 12]
    assert list(out["session_id"]) == [0, 1]


def test_session_lookup_covers_every_purchase(ray_session):
    df = _events_df()
    n_purch = int((df["event_type"] == "purchase").sum())
    out = ev.session_lookup(ray.data.from_pandas(df)).to_pandas()
    # sessions partition the full log, so every purchase matches exactly
    assert len(out) == n_purch
    sess = ev.sessionize(ray.data.from_pandas(df)).to_pandas()
    merged = out.merge(sess, on=["user_id", "session_id"])
    assert len(merged) == n_purch
    assert ((merged["ts_us"] >= merged["start_us"])
            & (merged["ts_us"] <= merged["end_us"])).all()


def test_rollup_sums_batching_invariant(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 500),
        "b": rng.choice(["p", "q"], 500),
        "v": np.round(rng.uniform(0, 9, 500), 2)})
    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(
            [df.iloc[i::nblocks].reset_index(drop=True)
             for i in range(nblocks)])
        out = relational.rollup_sums(ds, ["a", "b"], "v").to_pandas()
        outs.append(out.sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    # grand total row and a rolled prefix row, checked against pandas
    v_c = np.rint(df["v"].to_numpy() * 100).astype(np.int64)
    tot = got[(got["a"] == relational.ROLLUP_ALL)
              & (got["b"] == relational.ROLLUP_ALL)]
    assert len(tot) == 1 and tot["sum_c"].iloc[0] == v_c.sum() \
        and tot["n"].iloc[0] == 500
    xa = got[(got["a"] == "x") & (got["b"] == relational.ROLLUP_ALL)]
    mask = (df["a"] == "x").to_numpy()
    assert xa["sum_c"].iloc[0] == v_c[mask].sum()
    # full grouping sets count: 3*2 + 3 + 1
    assert len(got) == 10


def test_rollup_marker_collision_raises(ray_session):
    df = pd.DataFrame({"a": ["x", relational.ROLLUP_ALL], "b": ["p", "q"],
                       "v": [1.0, 2.0]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception):
        relational.rollup_sums(ds, ["a", "b"], "v").materialize()


def test_cell_rollup_levels_consistent(ray_session):
    rng = np.random.default_rng(5)
    level = 12
    ix = rng.integers(0, 64, 300).astype(np.uint64)
    iy = rng.integers(0, 64, 300).astype(np.uint64)
    cells = cellindex.cell_from_ixiy(ix, iy, level)
    import pyarrow as pa
    ds = ray.data.from_arrow(pa.table({"cell": pa.array(cells,
                                                        pa.uint64())}))
    out = rollup.cell_rollup(ds, base_level=level,
                             steps=(0, 1, 2)).to_pandas()
    for lv in (level, level - 1, level - 2):
        sub = out[out["level"] == lv]
        assert sub["n_tiles"].sum() == 300
    # parent counts equal the sum of their children's counts
    fine = out[out["level"] == level]
    par = out[out["level"] == level - 1].set_index(["cell_ix", "cell_iy"])
    rolled = fine.groupby(
        [fine["cell_ix"] // 2, fine["cell_iy"] // 2])["n_tiles"].sum()
    for (px, py), n in rolled.items():
        assert par.loc[(px, py), "n_tiles"] == n

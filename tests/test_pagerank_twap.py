"""pagerank_iters pinned against a single-machine fixed-point replay
on a hand graph (partitioning must not change a single bit), and
time_weighted_avg on a hand-built event sequence."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages.events import time_weighted_avg
from unmixing_ray.stages.relational import PR_SCALE, pagerank_iters


def _pr_ref(edges, iters, scale=PR_SCALE, num=85, den=100):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    base = (scale * (den - num)) // den
    r = {v: scale for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            s = sum(r[u] // len(adj[u]) for u in adj[v])
            nxt[v] = base + (num * s) // den
        r = nxt
    return r


@pytest.mark.parametrize("reparts", [1, 4])
def test_pagerank_matches_fixed_point_replay(ray_session, reparts):
    rng = np.random.default_rng(13)
    edges = set()
    while len(edges) < 40:
        a, b = rng.integers(0, 15, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    edges = sorted(edges)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"a": [e[0] for e in edges], "b": [e[1] for e in edges]}
    ).astype("int64")).repartition(reparts)
    got = pagerank_iters(ds, iters=3).to_pandas()
    want = _pr_ref(edges, 3)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert int(r["r"]) == want[int(r["v"])], int(r["v"])
    # a conservation sanity check: total rank stays near n*scale
    tot = got["r"].astype("int64").sum()
    assert abs(tot - len(want) * PR_SCALE) < len(want) * PR_SCALE


def test_time_weighted_avg_hand_fixture(ray_session):
    base = np.datetime64("2025-06-01T00:00:00.000000")
    us = np.timedelta64(1, "us")
    rows = [
        # user 1: v=2.00 held 10s, then v=4.00 held 5s, then end
        {"user_id": 1, "event_id": 1, "ts": base, "value": 2.0},
        {"user_id": 1, "event_id": 2, "ts": base + 10_000_000 * us,
         "value": 4.0},
        {"user_id": 1, "event_id": 3, "ts": base + 15_000_000 * us,
         "value": 9.0},
        # user 2: single event -> no intervals
        {"user_id": 2, "event_id": 4, "ts": base, "value": 1.0},
        # user 3: tied timestamps -> event_id breaks the tie
        {"user_id": 3, "event_id": 6, "ts": base, "value": 7.0},
        {"user_id": 3, "event_id": 5, "ts": base, "value": 3.0},
        {"user_id": 3, "event_id": 7, "ts": base + 2_000_000 * us,
         "value": 1.0},
    ]
    got = time_weighted_avg(ray.data.from_items(rows).repartition(3))\
        .to_pandas().set_index("user_id").sort_index()
    # user 1: 200c*10e6us + 400c*5e6us = 2e9 + 2e9 = 4e9
    assert got.loc[1, "twap_num"] == 4_000_000_000
    assert got.loc[1, "twap_den"] == 15_000_000
    assert got.loc[1, "n_intervals"] == 2
    assert got.loc[2, "twap_num"] == 0
    assert got.loc[2, "twap_den"] == 0
    assert got.loc[2, "n_intervals"] == 0
    # user 3: order by (ts, id) -> 300c*0us + 700c*2e6us = 1.4e9
    assert got.loc[3, "twap_num"] == 1_400_000_000
    assert got.loc[3, "twap_den"] == 2_000_000
    assert got.loc[3, "n_intervals"] == 2

"""merge_aggregate equivalence (state+delta == full recompute) and
range_lookup edge semantics (boundaries, gaps, out-of-range, the
disjointness contract)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages.relational import merge_aggregate, range_lookup


def test_merge_aggregate_equals_recompute(ray_session):
    rng = np.random.default_rng(31)
    old_rows = pd.DataFrame({
        "k": rng.integers(0, 20, 200), "v": rng.integers(1, 100, 200)
    }).astype("int64")
    state = old_rows.groupby("k", as_index=False).sum()
    delta = pd.DataFrame({
        "k": rng.integers(10, 30, 150), "v": rng.integers(1, 100, 150)
    }).astype("int64")
    got = merge_aggregate(
        ray.data.from_pandas(state).repartition(3),
        ray.data.from_pandas(delta).repartition(4), "k", "v")\
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = pd.concat([old_rows, delta]).groupby("k", as_index=False)\
        .sum().astype("int64").sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_range_lookup_edges(ray_session):
    bands = [(0, 10, 0), (10, 20, 1), (30, 40, 3)]   # gap [20, 30)
    df = pd.DataFrame({"v": [-1, 0, 9, 10, 19, 20, 25, 30, 39, 40, 99],
                       "rid": range(11)}).astype("int64")
    got = range_lookup(ray.data.from_pandas(df).repartition(2),
                       "v", bands, keep=["rid"]).to_pandas()\
        .sort_values("rid").reset_index(drop=True)
    assert got["band"].tolist() == [-1, 0, 0, 1, 1, -1, -1, 3, 3,
                                    -1, -1]
    with pytest.raises(ValueError):
        range_lookup(ray.data.from_pandas(df), "v",
                     [(0, 10, 0), (5, 15, 1)])   # overlap

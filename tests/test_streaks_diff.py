"""user_streaks island arithmetic on hand-built day sets, and the
snapshot_diff key-uniqueness contract + status table."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages.events import user_streaks
from unmixing_ray.stages.relational import snapshot_diff


def test_user_streaks_hand_fixture(ray_session):
    base = np.datetime64("2025-03-01T12:00:00")
    day = np.timedelta64(1, "D")
    rows = []
    # user 1: days 0,1,2, 5,6, 9 -> islands 3, max 3, n_days 6
    for d in (0, 1, 2, 5, 6, 9):
        rows.append({"user_id": 1, "ts": base + d * day})
        rows.append({"user_id": 1, "ts": base + d * day
                     + np.timedelta64(3, "h")})   # same-day dup
    # user 2: one day
    rows.append({"user_id": 2, "ts": base})
    got = user_streaks(ray.data.from_items(rows).repartition(3))\
        .to_pandas().set_index("user_id").sort_index()
    assert got.loc[1, "n_days"] == 6
    assert got.loc[1, "n_islands"] == 3
    assert got.loc[1, "max_streak"] == 3
    assert got.loc[2, "n_days"] == 1
    assert got.loc[2, "n_islands"] == 1
    assert got.loc[2, "max_streak"] == 1


def test_snapshot_diff_statuses_and_contract(ray_session):
    old = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3], "v": [10, 20, 30]}).astype("int64"))
    new = ray.data.from_pandas(pd.DataFrame(
        {"k": [2, 3, 4], "v": [20, 31, 40]}).astype("int64"))
    got = snapshot_diff(old, new, "k", "v").to_pandas()\
        .set_index("k").sort_index()
    assert got.loc[1, "status"] == "removed"
    assert got.loc[2, "status"] == "same"
    assert got.loc[3, "status"] == "changed"
    assert got.loc[4, "status"] == "added"
    assert got.loc[3, "old_v"] == 30 and got.loc[3, "new_v"] == 31
    assert got.loc[1, "new_v"] == 0 and got.loc[4, "old_v"] == 0
    # key-uniqueness violation must raise loudly
    dup = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 1], "v": [5, 6]}).astype("int64"))
    with pytest.raises(Exception):
        snapshot_diff(dup, new, "k", "v").to_pandas()

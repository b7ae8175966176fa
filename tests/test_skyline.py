"""Skyline combiner pinned against a brute-force dominance scan on
anti-correlated random data (large frontier) at several partitionings,
including duplicate points (all copies must survive)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages.relational import skyline


def _brute(rows):
    """rows: list of (x minimize, y maximize, id)."""
    out = []
    for i, (x, y, _) in enumerate(rows):
        dominated = any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y))
            for j, (x2, y2, _) in enumerate(rows) if j != i)
        if not dominated:
            out.append(rows[i])
    return sorted(out)


@pytest.mark.parametrize("reparts", [1, 6])
def test_skyline_anticorrelated(ray_session, reparts):
    rng = np.random.default_rng(21)
    x = rng.integers(0, 100, 120)
    # under (min x, max y) preferences, y tracking x creates the
    # trade-off: cheaper rows are also lower-valued -> big frontier
    y = x + rng.integers(-5, 6, 120)
    rows = [(int(a), int(b), i) for i, (a, b) in enumerate(zip(x, y))]
    rows += rows[:3]   # duplicates: every copy survives (or none)
    df = pd.DataFrame(rows, columns=["x", "y", "rid"]).astype("int64")
    ds = ray.data.from_pandas(df).repartition(reparts)
    got = skyline(ds, ["x", "y"], ["min", "max"], keep=["rid"])\
        .to_pandas()
    want = _brute(rows)
    got_rows = sorted((int(r["x"]), int(r["y"]), int(r["rid"]))
                      for _, r in got.iterrows())
    assert got_rows == want
    assert len(want) > 10   # the frontier is genuinely large

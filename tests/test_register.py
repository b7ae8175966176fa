"""Co-registration: exact integer circular cross-correlation recovery
pinned against brute force and against known degenerate tiebreaks."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages.register import (coregister, make_planted_pairs,
                                          planted_shift, recover_shift)


@pytest.mark.parametrize("seed,dy,dx", [(0, 0, 0), (1, -3, 2), (2, 3, -3),
                                        (3, 1, 1)])
def test_recover_shift_exact(seed, dy, dx):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 5000, (32, 40)).astype(np.int16)
    b = np.roll(a, (dy, dx), axis=(0, 1))
    gy, gx, peak = recover_shift(a, b, max_shift=3)
    assert (gy, gx) == (dy, dx)
    assert peak == int((a.astype(np.int64) ** 2).sum())


def test_recover_shift_constant_plane_tiebreak():
    # a constant plane scores identically at every offset: the
    # deterministic tiebreak must pick the smallest (dy, dx)
    a = np.full((16, 16), 7, dtype=np.int16)
    gy, gx, _ = recover_shift(a, a, max_shift=2)
    assert (gy, gx) == (-2, -2)


def test_coregister_dataset_roundtrip(ray_session):
    rng = np.random.default_rng(9)
    rows = []
    for i in range(17):
        a = rng.integers(0, 3000, (24, 24)).astype("<i2")
        dy, dx = planted_shift(i, 3)
        b = np.roll(a, (dy, dx), axis=(0, 1))
        rows.append({"image_id": "img%08d" % i, "h": 24, "w": 24,
                     "ref": a.tobytes(),
                     "tgt": np.ascontiguousarray(b).tobytes()})
    ds = ray.data.from_items(rows).repartition(4)
    got = coregister(ds, max_shift=3).to_pandas()
    for _, r in got.iterrows():
        seq = int(r["image_id"][3:])
        assert (int(r["dy"]), int(r["dx"])) == planted_shift(seq, 3)

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


def test_blur_scores_separates_sharp_from_blurred(ray_session):
    """Engine-level sanity: a box-blurred copy of a noisy plane must
    score a strictly lower Laplacian variance than the original."""
    import pyarrow as pa
    import ray.data
    from unmixing_ray.codecs import encode_image
    from unmixing_ray.stages.curate import blur_scores

    rng = np.random.default_rng(5)
    sharp = rng.integers(0, 5000, (1, 32, 32)).astype(np.int16)
    k = np.ones((3, 3)) / 9.0
    sm = sharp[0].astype(np.float64)
    blurred = sm.copy()
    blurred[1:-1, 1:-1] = sum(
        sm[1 + dr:31 + dr, 1 + dc:31 + dc] * k[dr + 1, dc + 1]
        for dr in (-1, 0, 1) for dc in (-1, 0, 1))
    blurred = blurred.astype(np.int16)[None]
    rows = []
    for name, a in (("sharp", sharp), ("blurred", blurred)):
        rows.append({"image_id": name, "bytes": encode_image(a, "raw"),
                     "w": 32, "h": 32, "fmt": "raw"})
    got = blur_scores(ray.data.from_items(rows)).to_pandas()\
        .set_index("image_id")

    def var(r):
        n = r["n_lap"]
        return r["lap_sq"] / n - (r["lap_sum"] / n) ** 2

    assert var(got.loc["sharp"]) > 4 * var(got.loc["blurred"])

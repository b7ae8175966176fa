"""signature_hamming_pairs: exhaustive pigeonhole blocking over a
precomputed 64-bit signature column (phash image near-dup)."""

import numpy as np
import pandas as pd
import pytest

from unmixing_ray.stages.dedup import signature_hamming_pairs


def _exact_pairs(ids, sigs, max_hamming):
    out = []
    order = np.argsort(np.asarray(ids, dtype=object))
    ids = [ids[i] for i in order]
    sigs = np.asarray(sigs, dtype=np.uint64)[order]
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(int(sigs[i] ^ sigs[j])).count("1")
            if h <= max_hamming:
                out.append((ids[i], ids[j], h))
    return sorted(out)


def _run(ids, sigs, max_hamming, **kw):
    import ray.data
    df = pd.DataFrame({
        "image_id": pd.Series(ids, dtype=object),
        "phash": np.asarray(sigs, dtype=np.uint64).view(np.int64)})
    ds = ray.data.from_pandas(df).repartition(3)
    got = signature_hamming_pairs(ds, max_hamming=max_hamming,
                                  **kw).to_pandas()
    if got.empty and "img_a" not in got.columns:
        # Ray groupby().aggregate() loses the schema when every
        # upstream block is empty — an empty frame IS the right answer
        return []
    return sorted(zip(got["img_a"], got["img_b"], got["hamming"]))


def test_random_vs_exact(ray_session):
    rng = np.random.default_rng(42)
    n = 80
    base = rng.integers(0, 2**63, size=n, dtype=np.uint64)
    # plant near-dups at several budgets around a few base signatures
    sigs = list(base)
    ids = ["img%05d" % i for i in range(n)]
    for k, nbits in [(0, 1), (1, 3), (2, 4), (3, 5), (4, 0)]:
        mask = np.uint64(0)
        for b in rng.choice(64, size=nbits, replace=False):
            mask |= np.uint64(1) << np.uint64(int(b))
        sigs.append(base[k] ^ mask)
        ids.append("img%05d_nd" % k)
    for mh in (0, 2, 4, 6):
        assert _run(ids, sigs, mh) == _exact_pairs(ids, sigs, mh), mh


def test_exact_duplicates_pair_at_zero(ray_session):
    sigs = [np.uint64(7), np.uint64(7), np.uint64(7)]
    ids = ["a", "b", "c"]
    got = _run(ids, sigs, 0)
    assert got == [("a", "b", 0), ("a", "c", 0), ("b", "c", 0)]


def test_hot_bucket_cap_falls_back_to_min_pairing(ray_session):
    # 10 identical signatures with cap 4: every bucket is hot, so pairs
    # are (min, other) only — the documented approximation
    ids = ["d%02d" % i for i in range(10)]
    sigs = [np.uint64(123456789)] * 10
    got = _run(ids, sigs, 2, bucket_cap=4)
    assert got == [("d00", "d%02d" % i, 0) for i in range(1, 10)]


def test_empty_and_single(ray_session):
    assert _run(["only"], [np.uint64(5)], 4) == []

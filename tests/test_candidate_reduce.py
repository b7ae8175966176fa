"""Associativity of the fused-induce candidate reduce: the side-channel
path (one reduce over all parts) and the chunked recompute path (reduce
per chunk, then merge the reduced pools) must produce identical pools —
this is the invariant that makes resumed runs bit-identical."""

import numpy as np

from unmixing_ray.stages import unmix as u


def _fake_part(rng, n_tiles, start, p=6):
    r = 2 * p + 1
    cells = rng.integers(0, 500, n_tiles).astype(np.uint64)
    tiles = np.array(["t%06d" % (start + i) for i in range(n_tiles)])
    roles = np.concatenate([2 * np.arange(p), 2 * np.arange(p) + 1,
                            [2 * p]]).astype(np.int16)
    return {
        "cell": np.repeat(cells, r),
        "role": np.tile(roles, n_tiles),
        "value": rng.normal(size=n_tiles * r),
        "tile_id": np.repeat(tiles, r),
        "pixel": rng.integers(0, 1024, n_tiles * r).astype(np.int32),
        "spectra": rng.normal(size=(n_tiles * r, p)),
        "p": p,
    }


def test_reduce_is_associative():
    rng = np.random.default_rng(3)
    parts = [_fake_part(rng, 50, i * 50) for i in range(5)]
    whole = u.reduce_candidates(parts)
    merged = u.merge_side_pools(
        [u.reduce_candidates([pt]) for pt in parts])
    for k in ("key", "value", "pixel", "tile_id"):
        assert np.array_equal(whole[k], merged[k]), k
    assert np.array_equal(whole["spectra"], merged["spectra"])


def test_reduce_order_invariance():
    rng = np.random.default_rng(5)
    parts = [_fake_part(rng, 30, i * 30) for i in range(4)]
    fwd = u.reduce_candidates(parts)
    rev = u.reduce_candidates(parts[::-1])
    for k in ("key", "value", "pixel", "tile_id"):
        assert np.array_equal(fwd[k], rev[k]), k


def test_reduce_tiebreak_lowest_tile_pixel():
    p = 2
    base = {
        "cell": np.array([0, 0], dtype=np.uint64),
        "role": np.array([0, 0], dtype=np.int16),     # band-0 min
        "value": np.array([1.0, 1.0]),
        "tile_id": np.array(["b", "a"]),
        "pixel": np.array([5, 9], dtype=np.int32),
        "spectra": np.array([[1.0, 2.0], [3.0, 4.0]]),
        "p": p,
    }
    red = u.reduce_candidates([base])
    assert len(red["key"]) == 1
    assert red["tile_id"][0] == "a" and red["pixel"][0] == 9

"""Deletion-neighborhood edit-distance join: the blocking must be
EXHAUSTIVE for lev-1 pairs (property-tested against brute-force
Levenshtein over a random small-alphabet vocabulary) and the verify
must reject the lev-2 candidates the blocking admits."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages.text import _lev_le1, edit_distance_join


def _lev(a, b):
    """Plain DP Levenshtein (independent reference)."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def test_lev_le1_matches_dp_reference():
    rng = np.random.default_rng(5)
    vocab = set()
    while len(vocab) < 60:
        n = rng.integers(1, 6)
        vocab.add("".join("abc"[k] for k in rng.integers(0, 3, n)))
    vocab = sorted(vocab)
    for x, y in itertools.combinations(vocab, 2):
        assert _lev_le1(x, y) == (_lev(x, y) == 1), (x, y)


def test_join_finds_exactly_the_lev1_pairs(ray_session):
    rng = np.random.default_rng(9)
    vocab = set()
    while len(vocab) < 40:   # feasible: 3+9+27+81 distinct strings
        n = rng.integers(1, 5)
        vocab.add("".join("abc"[k] for k in rng.integers(0, 3, n)))
    vocab = sorted(vocab)
    # each token appears (index+1) times across a few docs
    toks = [t for i, t in enumerate(vocab) for _ in range(i + 1)]
    rng.shuffle(toks)
    docs_rows = [" ".join(toks[i::7]) for i in range(7)]
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs_rows)])
    got = edit_distance_join(docs).to_pandas()
    got_pairs = set(zip(got["tok_a"], got["tok_b"]))
    want_pairs = {(x, y) for x, y in itertools.combinations(vocab, 2)
                  if _lev(x, y) == 1}
    assert got_pairs == want_pairs
    # counts are corpus frequencies
    freq = pd.Series(toks).value_counts()
    for _, r in got.iterrows():
        assert r["n_a"] == freq[r["tok_a"]]
        assert r["n_b"] == freq[r["tok_b"]]

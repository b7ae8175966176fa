"""Inverted-index dictionary build: python-reference parity, shard
completeness (the 16 md5-prefix shards partition the dictionary)."""

import hashlib
import re
from collections import Counter

import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages.text import inverted_index

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "the Cat sat on the mat",
    "a cat and a dog",
    "Dogs chase cats; cats nap.",
    "numbers 42 and 42 and 7",
    "",
    "THE THE the",
]


def _ref(docs, prefix):
    tf, dfc = Counter(), Counter()
    for s in docs:
        c = Counter(TOK.findall(s.lower()))
        for t, n in c.items():
            if hashlib.md5(t.encode()).hexdigest().startswith(prefix):
                tf[t] += n
                dfc[t] += 1
    return sorted((t, dfc[t], tf[t]) for t in tf)


def _run(docs, prefix, parts=3):
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": range(len(docs)),
        "text": pd.Series(docs, dtype=object)})).repartition(parts)
    got = inverted_index(ds, vocab_prefix=prefix).to_pandas()
    if got.empty and "term" not in got.columns:
        return []
    return sorted(zip(got["term"], got["df"], got["tf"]))


@pytest.mark.parametrize("parts", [1, 3])
def test_full_dictionary_matches_reference(ray_session, parts):
    assert _run(DOCS, "", parts) == _ref(DOCS, "")


def test_prefix_shards_partition_the_dictionary(ray_session):
    full = _ref(DOCS, "")
    merged = []
    for h in "0123456789abcdef":
        merged.extend(_run(DOCS, h, parts=2))
    assert sorted(merged) == full


def test_tf_counts_multiplicity_df_counts_docs(ray_session):
    rows = dict((t, (d, f)) for t, d, f in _run(DOCS, ""))
    assert rows["the"] == (2, 5)   # docs 0 and 5; 2 + 3 occurrences
    assert rows["42"] == (1, 2)
    assert rows["cats"] == (1, 2)
    assert rows["cat"] == (2, 2)

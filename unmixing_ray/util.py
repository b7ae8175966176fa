"""Small plain-Python utilities mirroring reference helpers."""

from __future__ import annotations


def combine_dicts(*dicts):
    """Merge dictionaries-of-lists by extending per key.
    Reference: utils.py:283-306 (idempotence pinned test/tests.py:398-410).
    """
    out = {}
    keys = set()
    for d in dicts:
        keys |= set(d.keys())
    for key in keys:
        for d in dicts:
            if key not in d:
                continue
            out.setdefault(key, []).extend(d[key])
    return out


def partition(n, num_partitions):
    """Equal index ranges over n items (reference utils.py:872-887 but
    without the trailing +1 overshoot bug; used only for driver-side
    chunking of small candidate sets — Ray Data owns real partitioning)."""
    import numpy as np
    breaks = np.linspace(0, n, num_partitions + 1, dtype=int)
    return list(zip(breaks[:-1], breaks[1:]))

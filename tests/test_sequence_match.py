"""sequence_match greedy semantics on hand-built sessions: strict-time
ordering, interleaved noise, missing steps, session splitting, and the
timestamp-tie rule (strict time, not position)."""

import numpy as np
import pytest

import ray.data

from unmixing_ray.stages.events import sequence_match

BASE = np.datetime64("2025-05-01T00:00:00.000000")
US = np.timedelta64(1, "us")
MIN = 60_000_000


def _ev(uid, eid, off_us, typ):
    return {"user_id": uid, "event_id": eid, "ts": BASE + off_us * US,
            "event_type": typ}


def test_sequence_match_hand_sessions(ray_session):
    rows = [
        # user 1 session 0: view click purchase with noise -> match,
        # greedy picks the EARLIEST feasible of each step
        _ev(1, 1, 0, "view"), _ev(1, 2, 1 * MIN, "error"),
        _ev(1, 3, 2 * MIN, "view"), _ev(1, 4, 3 * MIN, "click"),
        _ev(1, 5, 4 * MIN, "click"), _ev(1, 6, 5 * MIN, "purchase"),
        # user 1 session 1 (2h later, gap_s=3600 splits): no purchase
        _ev(1, 7, 180 * MIN, "view"), _ev(1, 8, 181 * MIN, "click"),
        # user 2: purchase BEFORE view/click -> no match
        _ev(2, 9, 0, "purchase"), _ev(2, 10, 1 * MIN, "view"),
        _ev(2, 11, 2 * MIN, "click"),
        # user 3: click at the SAME microsecond as view -> strict time
        # rejects it; the later click matches
        _ev(3, 12, 0, "view"), _ev(3, 13, 0, "click"),
        _ev(3, 14, 1 * MIN, "click"), _ev(3, 15, 2 * MIN, "purchase"),
    ]
    got = sequence_match(ray.data.from_items(rows).repartition(3),
                         gap_s=3600).to_pandas()
    got = got.sort_values(["user_id", "session_idx"])\
        .reset_index(drop=True)
    assert len(got) == 2
    r1 = got.iloc[0]
    assert (int(r1["user_id"]), int(r1["session_idx"])) == (1, 0)
    b = BASE.astype("datetime64[us]").astype(np.int64)
    assert int(r1["t_step0"]) == b                  # first view
    assert int(r1["t_step1"]) == b + 3 * MIN        # earliest click
    assert int(r1["t_step2"]) == b + 5 * MIN
    r3 = got.iloc[1]
    assert int(r3["user_id"]) == 3
    assert int(r3["t_step1"]) == b + 1 * MIN        # tie rejected

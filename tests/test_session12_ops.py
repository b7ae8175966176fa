"""Session-12 operators: interval-overlap session join, recency-decay
score — hand-case pins independent of the DuckDB parity tests."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages import events as ev

US = 1_000_000


def _events(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us",
                                     "event_type"])
    df["ts"] = df["ts_us"].astype("datetime64[us]")
    df["value"] = 0.0
    df["props"] = ""
    return ray.data.from_pandas(
        df[["event_id", "ts", "user_id", "event_type", "value",
            "props"]])


def test_session_overlap_hand_case(ray_session):
    # user 1: view session [0, 100s], click session [50s, 150s] overlap
    #         50s; second click session [400s, 400s] does not overlap.
    # user 2: touching endpoints (view ends exactly when click starts)
    #         count with overlap 0 (closed intervals).
    # user 3: clicks only -> no rows.
    rows = [
        (1, 1, 0 * US, "view"), (2, 1, 100 * US, "view"),
        (3, 1, 50 * US, "click"), (4, 1, 150 * US, "click"),
        (5, 1, 400 * US, "click"),
        (6, 2, 10 * US, "view"), (7, 2, 20 * US, "view"),
        (8, 2, 20 * US, "click"), (9, 2, 120 * US, "click"),
        (10, 3, 5 * US, "click"),
    ]
    out = ev.session_overlap(_events(rows), gap_s=120).to_pandas() \
        .sort_values(["user_id", "a_session", "b_session"]) \
        .reset_index(drop=True)
    assert len(out) == 2
    r0 = out.iloc[0]
    assert (r0["user_id"], r0["a_session"], r0["b_session"]) == (1, 0, 0)
    assert r0["overlap_us"] == 50 * US
    r1 = out.iloc[1]
    assert (r1["user_id"], r1["overlap_us"]) == (2, 0)


def test_session_overlap_partitioning_invariant(ray_session):
    rng = np.random.default_rng(7)
    rows = [(i, int(rng.integers(0, 5)), int(rng.integers(0, 3000)) * US,
             ("view", "click")[int(rng.integers(0, 2))])
            for i in range(200)]

    def run(nblocks):
        ds = _events(rows).repartition(nblocks)
        return ev.session_overlap(ds, gap_s=300).to_pandas() \
            .sort_values(["user_id", "a_session", "b_session"]) \
            .reset_index(drop=True)

    a, b = run(1), run(13)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_decay_score_exact_powers(ray_session):
    # anchor = max ts = day 25; ages 0, 5, 25 -> 2^20 + 2^15 + 0
    day = 86_400 * US
    rows = [
        (1, 1, 25 * day, "view"),      # age 0  -> 2^20
        (2, 1, 20 * day, "view"),      # age 5  -> 2^15
        (3, 1, 0 * day, "view"),       # age 25 -> expired
        (4, 2, 25 * day - 1, "view"),  # age 0 (floor) -> 2^20
    ]
    out = ev.decay_score(_events(rows), max_age_days=20).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out.loc[0, "score"] == (1 << 20) + (1 << 15)
    assert out.loc[0, "n_live"] == 2
    assert out.loc[0, "n_expired"] == 1
    assert out.loc[1, "score"] == 1 << 20


def test_morton2_interleave():
    from unmixing_ray.state.zonemap import morton2
    # x=101, y=011 -> interleave (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1
    assert int(morton2(0b101, 0b011)) == 0b011011
    # monotone locality: same-bucket pairs share a code
    assert morton2([3, 3], [5, 5]).tolist()[0] == \
        morton2([3], [5]).tolist()[0]


def test_zorder_zonemap_prunes_and_counts(ray_session, tmp_path):
    from unmixing_ray.state import zonemap
    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 100000, n).astype(np.int64),
        "y": rng.integers(0, 365, n).astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(8)
    out = str(tmp_path / "zo")
    zmap = zonemap.write_zorder_zonemap(ds, out, n_files=16)
    assert len(zmap) == 16 and int(zmap["n"].sum()) == n
    res = zonemap.pruned_box_count(out, zmap, 20000, 40000, 100, 200)
    want = int(((df.x >= 20000) & (df.x <= 40000) &
                (df.y >= 100) & (df.y <= 200)).sum())
    assert int(res["n_match"].iloc[0]) == want
    # the two-column map must actually skip: a box covering ~1/5 x 1/3.6
    # of the space cannot need every file under a Z-order layout
    assert int(res["files_read"].iloc[0]) < 16
    assert int(res["rows_scanned"].iloc[0]) < n


def test_common_neighbors_brute_force(ray_session):
    from unmixing_ray.stages.relational import common_neighbors
    rng = np.random.default_rng(11)
    pairs = set()
    while len(pairs) < 120:
        u, v = sorted(rng.integers(0, 40, 2).tolist())
        if u != v:
            pairs.add((u, v))
    edf = pd.DataFrame(sorted(pairs), columns=["a", "b"]).astype("int64")
    got = common_neighbors(
        ray.data.from_pandas(edf).repartition(5),
        k=10, deg_cap=64, min_common=1).to_pandas() \
        .sort_values("rank").reset_index(drop=True)

    # brute force
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    cn = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in pairs:
                continue
            c = len(adj[u] & adj[v])
            if c >= 1:
                cn[(u, v)] = c
    want = sorted(cn.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(got) == len(want)
    for i, ((u, v), c) in enumerate(want):
        assert (got.loc[i, "u"], got.loc[i, "v"],
                got.loc[i, "n_common"]) == (u, v, c)


def test_common_neighbors_deg_cap_drops_hub_wedges(ray_session):
    from unmixing_ray.stages.relational import common_neighbors
    # star around node 0 (hub deg 5) plus one extra edge: with
    # deg_cap=4 the hub generates no wedges at all
    edf = pd.DataFrame({"a": [0, 0, 0, 0, 0, 1],
                        "b": [1, 2, 3, 4, 5, 2]}).astype("int64")
    got = common_neighbors(ray.data.from_pandas(edf),
                           k=10, deg_cap=4, min_common=1).to_pandas()
    # only apexes 1 and 2 (deg 2 each) generate the (0,2)/(0,1) wedges,
    # both of which are existing edges -> empty result
    assert len(got) == 0


def test_grouped_mad_brute_force(ray_session):
    from unmixing_ray.stages.relational import grouped_mad
    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n).astype(np.int64),
        "val": np.round(rng.normal(50, 20, n), 2)})
    got = grouped_mad(ray.data.from_pandas(df).repartition(6),
                      "k", "val", scale=100) \
        .sort_values("k").reset_index(drop=True)

    def disc_median(v):
        v = np.sort(v)
        return v[int(np.ceil(0.5 * len(v))) - 1]

    for _, r in got.iterrows():
        v = np.rint(df[df.k == r["k"]]["val"].to_numpy() * 100) \
            .astype(np.int64)
        med = disc_median(v)
        assert r["median"] == med
        assert r["mad"] == disc_median(np.abs(v - med))


def test_silence_summary_hand_case():
    from unmixing_ray.stages.media import silence_summary
    # |x| < 3: runs [0,2) len 2 (leading), [4,5) len 1, [7,9) len 2
    # (trailing)
    x = np.array([0, 2, 5, -9, 1, 3, -4, 0, -2], dtype=np.int16)
    n, ns, nr, mr, ws = silence_summary(x, 3)
    assert (n, ns, nr, mr) == (9, 5, 3, 2)
    assert ws == (0 + 1) * 2 + (4 + 1) * 1 + (7 + 1) * 2
    # all-silent and all-loud edges
    assert silence_summary(np.zeros(4, np.int16), 1) == (4, 4, 1, 4, 4)
    assert silence_summary(np.full(4, 100, np.int16), 1) == \
        (4, 0, 0, 0, 0)
    assert silence_summary(np.zeros(0, np.int16), 1) == (0, 0, 0, 0, 0)


def test_video_motion_mode_and_checksum(ray_session):
    from unmixing_ray.stages.media import (MotionActor,
                                           motion_vector_code)
    # custom decoder: frame f = base rolled by the per-pair vectors
    # (1,0), (1,0), (0,-2) -> mode (1,0) with 2 of 3 pairs agreeing
    base = np.arange(48, dtype=np.uint8).reshape(6, 8)
    shifts = [(0, 0), (1, 0), (2, 0), (2, -2)]

    def dec(buf, idx, h, w):
        return np.roll(base, shifts[idx], axis=(0, 1))

    import pyarrow as pa
    batch = pa.table({
        "media_id": ["clip"], "bytes": [b"x"],
        "n_frames": pa.array([4], pa.int32()),
        "h": pa.array([6], pa.int32()),
        "w": pa.array([8], pa.int32())})
    out = MotionActor(radius=2, decoder=dec)(batch).to_pandas()
    r = out.iloc[0]
    assert (r["n_pairs"], r["mode_dy"], r["mode_dx"],
            r["n_agree"]) == (3, 1, 0, 2)
    c10 = motion_vector_code(1, 0, 2)
    c0m2 = motion_vector_code(0, -2, 2)
    assert r["pair_wsum"] == 1 * c10 + 2 * c10 + 3 * c0m2


def test_synthetic_motion_frame_velocity_is_recoverable():
    from unmixing_ray.stages.media import synthetic_motion_frame
    buf = b"some payload"
    f0 = synthetic_motion_frame(buf, 0, 16, 16).astype(np.int64)
    f1 = synthetic_motion_frame(buf, 1, 16, 16).astype(np.int64)
    sads = {(dy, dx): int(np.abs(np.roll(f0, (dy, dx), axis=(0, 1))
                                 - f1).sum())
            for dy in range(-2, 3) for dx in range(-2, 3)}
    best = min(sads.items(), key=lambda kv: (kv[1], kv[0]))
    assert best[1] == 0   # the planted shift reproduces exactly


def test_daily_locf_hand_case(ray_session):
    from unmixing_ray.stages.events import daily_locf
    day = 86_400 * US
    # user 1: day 0 -> 1.00 (two events, later wins: 2.00), day 2 ->
    # 3.00; corpus max day = 3 (user 2) so user 1 fills days 0..3
    rows = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "ts": pd.Series([0, 3600 * US, 2 * day, 3 * day])
        .astype("datetime64[us]"),
        "user_id": [1, 1, 1, 2],
        "event_type": ["view"] * 4,
        "value": [1.0, 2.0, 3.0, 9.0],
        "props": [""] * 4})
    out = daily_locf(ray.data.from_pandas(rows)).to_pandas() \
        .sort_values(["user_id", "day"]).reset_index(drop=True)
    u1 = out[out.user_id == 1]
    assert u1["day"].tolist() == [0, 1, 2, 3]
    assert u1["value_cents"].tolist() == [200, 200, 300, 300]
    u2 = out[out.user_id == 2]
    assert u2["day"].tolist() == [3]
    assert u2["value_cents"].tolist() == [900]


def test_box_median_brute_force():
    from unmixing_ray.stages.focal import _box_median
    rng = np.random.default_rng(2)
    H, W, r = 7, 9, 1
    img = rng.integers(0, 50, (2, H, W)).astype(np.int64)
    vals = np.zeros((2, H + 2, W + 2), dtype=np.int64)
    valid = np.zeros((H + 2, W + 2), dtype=np.int64)
    vals[:, 1:-1, 1:-1] = img
    valid[1:-1, 1:-1] = 1
    got = _box_median(vals, valid, r)
    for b in range(2):
        for y in range(H):
            for x in range(W):
                win = img[b, max(0, y - r):y + r + 1,
                          max(0, x - r):x + r + 1].ravel()
                v = np.sort(win)
                assert got[b, y, x] == v[(len(v) + 1) // 2 - 1], \
                    (b, y, x)


def test_knn_graph_guard_and_brute_force(ray_session):
    from unmixing_ray.stages.ann import knn_graph
    rng = np.random.default_rng(9)
    n, d, k = 40, 8, 3
    M = rng.normal(size=(n, d))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(M)})
    ds = ray.data.from_pandas(df).repartition(4)
    with pytest.raises(ValueError):
        knn_graph(ds, k=k, max_rows=10)
    got = knn_graph(ds, k=k).to_pandas() \
        .sort_values(["vec_id", "rnk"]).reset_index(drop=True)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    su = np.floor(Mn @ Mn.T * 10_000).astype(np.int64)
    for q in range(n):
        cand = [(int(-su[q, v]), v) for v in range(n) if v != q]
        want = [v for _, v in sorted(cand)[:k]]
        assert got[got.vec_id == q]["nbr_id"].tolist() == want


def test_window_join_hand_case(ray_session):
    from unmixing_ray.stages.events import window_join
    rows = [
        # user 1: purchase at t=100s; clicks at 50s, 99s, 161s, 400s
        (1, 1, 100 * US, "purchase"),
        (2, 1, 50 * US, "click"), (3, 1, 99 * US, "click"),
        (4, 1, 161 * US, "click"), (5, 1, 400 * US, "click"),
        # user 2: purchase only -> no pairs
        (6, 2, 10 * US, "purchase"),
    ]
    out = window_join(_events(rows), window_s=60).to_pandas() \
        .sort_values("matched_id").reset_index(drop=True)
    # window +-60s around t=100: clicks at 50, 99, 161 (inclusive
    # bounds: 161 - 100 = 61 > 60 -> excluded); 400 excluded
    assert out["matched_id"].tolist() == [2, 3]
    assert out["lag_us"].tolist() == [-50 * US, -1 * US]
    assert (out["event_id"] == 1).all()

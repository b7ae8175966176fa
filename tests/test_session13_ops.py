"""Session-13 operators: SCD2 interval build, weekday seasonality —
hand-case pins independent of the DuckDB parity tests."""

import numpy as np
import pandas as pd

import ray.data

from unmixing_ray.stages import events as ev

US = 1_000_000
DAY = 86_400 * US


def _events(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us",
                                     "event_type"])
    df["ts"] = df["ts_us"].astype("datetime64[us]")
    df["value"] = 0.0
    df["props"] = ""
    return ray.data.from_pandas(
        df[["event_id", "ts", "user_id", "event_type", "value",
            "props"]])


def test_scd2_hand_case(ray_session):
    # user 1: a,a,b,a -> three versions (a x2, b, a); user 2: single
    # event -> one open version. Timestamp tie at 30s resolved by
    # event_id (3 before 4), so the 'b' run starts at 30s.
    rows = [
        (1, 1, 0 * US, "a"), (2, 1, 10 * US, "a"),
        (3, 1, 30 * US, "b"), (4, 1, 30 * US, "a"),
        (5, 2, 7 * US, "z"),
    ]
    out = ev.scd2_intervals(_events(rows)).to_pandas() \
        .sort_values(["user_id", "version"]).reset_index(drop=True)
    assert len(out) == 4
    u1 = out[out["user_id"] == 1]
    assert list(u1["value"]) == ["a", "b", "a"]
    assert list(u1["version"]) == [1, 2, 3]
    assert list(u1["valid_from_us"]) == [0, 30 * US, 30 * US]
    assert list(u1["valid_to_us"]) == [30 * US, 30 * US, -1]
    assert list(u1["n_events"]) == [2, 1, 1]
    assert list(u1["is_current"]) == [0, 0, 1]
    u2 = out[out["user_id"] == 2].iloc[0]
    assert (u2["value"], u2["valid_to_us"], u2["is_current"]) == \
        ("z", -1, 1)


def test_scd2_partitioning_invariant(ray_session):
    rng = np.random.default_rng(13)
    rows = [(i, int(rng.integers(0, 6)),
             int(rng.integers(0, 500)) * US,
             ("a", "b", "c")[int(rng.integers(0, 3))])
            for i in range(300)]

    def run(nblocks):
        ds = _events(rows).repartition(nblocks)
        return ev.scd2_intervals(ds).to_pandas() \
            .sort_values(["user_id", "version"]).reset_index(drop=True)

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)


def test_seasonality_exact_weights(ray_session):
    # one event per weekday for type 'u' (uniform -> sums of the weight
    # rows themselves); type 'm' only on phase 1 and 3.
    rows = [(p, 1, p * DAY, "u") for p in range(7)]
    rows += [(10, 1, 1 * DAY, "m"), (11, 1, 3 * DAY, "m"),
             (12, 1, (7 + 3) * DAY, "m")]
    out = ev.seasonality_score(_events(rows)).to_pandas() \
        .set_index("event_type")
    wc, ws = ev._DOW_COS, ev._DOW_SIN
    assert out.loc["u", "n"] == 7
    assert out.loc["u", "s_cos"] == sum(wc)
    assert out.loc["u", "s_sin"] == sum(ws)
    assert out.loc["m", "n"] == 3
    assert out.loc["m", "s_cos"] == wc[1] + 2 * wc[3]
    assert out.loc["m", "s_sin"] == ws[1] + 2 * ws[3]


def test_seasonality_partitioning_invariant(ray_session):
    rng = np.random.default_rng(5)
    rows = [(i, 1, int(rng.integers(0, 40 * 86_400)) * US,
             ("x", "y")[int(rng.integers(0, 2))])
            for i in range(400)]

    def run(nblocks):
        ds = _events(rows).repartition(nblocks)
        return ev.seasonality_score(ds).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)

    pd.testing.assert_frame_equal(run(1), run(5))


def test_otsu_fixed_point_bimodal():
    """A clean bimodal histogram must threshold in the valley, and the
    smallest-t tiebreak must hold on a symmetric two-spike case."""
    from unmixing_ray.stages.enhance import _otsu_fixed_point
    h = np.zeros(16, dtype=np.int64)
    h[2] = 100
    h[3] = 80
    h[12] = 90
    h[13] = 110
    t, score = _otsu_fixed_point(h)
    assert 3 <= t <= 11, t
    assert score > 0
    # two equal spikes: every t between them gives the same partition
    # (empty bins carry the previous running sums) -> smallest wins
    h2 = np.zeros(8, dtype=np.int64)
    h2[1] = 50
    h2[6] = 50
    t2, _ = _otsu_fixed_point(h2)
    assert t2 == 1, t2


def test_hough_recovers_synthetic_lines(ray_session):
    """Hand-built tiles with one horizontal and one diagonal NODATA
    line crossing a tile boundary: votes must merge across tiles and
    the packed argmax must break ties to the smallest rho."""
    import pyarrow as pa
    from unmixing_ray.constants import NODATA
    from unmixing_ray.stages import hough

    def tile(img, ro, co, arr):
        a = np.asarray(arr, dtype=np.int16)[None, :, :]
        return {"image_id": img, "tile_id": f"{img}_{ro}_{co}",
                "row_off": ro, "col_off": co, "h": a.shape[1],
                "w": a.shape[2], "bands": 1, "cell": 0,
                "pixels": a.tobytes()}

    # image of 4x8 pixels as two 4x4 tiles; NODATA on full row y=2 and
    # the diagonal x - y = 1
    base = np.zeros((4, 8), np.int16)
    base[2, :] = NODATA
    for y in range(4):
        x = y + 1
        if x < 8:
            base[y, x] = NODATA
    rows = [tile("a", 0, 0, base[:, :4]), tile("a", 0, 4, base[:, 4:])]
    import ray.data
    ds = ray.data.from_items(rows).map_batches(
        lambda t: pa.table({
            "image_id": t["image_id"], "tile_id": t["tile_id"],
            "row_off": t["row_off"].cast(pa.int32()),
            "col_off": t["col_off"].cast(pa.int32()),
            "h": t["h"].cast(pa.int32()), "w": t["w"].cast(pa.int32()),
            "bands": t["bands"].cast(pa.int32()),
            "cell": t["cell"].cast(pa.uint64()),
            "pixels": t["pixels"].cast(pa.binary())}),
        batch_format="pyarrow")
    out = hough.hough_lines(ds).to_pandas().set_index("dir")
    # dir 0: row y=2 has 8 NODATA pixels (the diagonal's (2,3) is one
    # of them — votes count PIXELS, never double)
    assert out.loc[0, "best_rho"] == -2 and out.loc[0, "votes"] == 8
    # dir 2 (rho = x - y): the rho=1 line holds the diagonal pixels
    # (0,1),(1,2),(2,3),(3,4) -> 4 votes; each other rho gets at most
    # one vote from row 2
    assert out.loc[2, "best_rho"] == 1 and out.loc[2, "votes"] == 4


def test_morph_open_tile_boundary(ray_session):
    """A 2-px-wide fg bar straddling a tile boundary erodes away
    entirely (3x3 erosion kills width<=2 except where the shrunk
    border window preserves it), while a solid 4x4 block survives
    opening in its interior-protected core; chained halos must agree
    with the single-image replay."""
    import pyarrow as pa
    from unmixing_ray.stages import morphology

    H = W = 8   # one image, four 4x4 tiles
    z = np.zeros((H, W), np.int16)
    z[3:5, :] = 9000         # horizontal bar rows 3-4 (crosses tiles)
    z[0:4, 0:4] = 9000       # solid block in tile (0,0)

    def tiles_of(z, T):
        rows = []
        for ro in range(0, H, T):
            for co in range(0, W, T):
                sub = z[ro:ro + T, co:co + T][None]
                rows.append({
                    "image_id": "a", "tile_id": f"a_{ro}_{co}",
                    "row_off": ro, "col_off": co, "h": T, "w": T,
                    "bands": 1, "cell": 0,
                    "pixels": np.ascontiguousarray(sub).tobytes()})
        return rows

    def to_ds(rows):
        import ray.data
        return ray.data.from_items(rows).map_batches(
            lambda t: pa.table({
                "image_id": t["image_id"], "tile_id": t["tile_id"],
                "row_off": t["row_off"].cast(pa.int32()),
                "col_off": t["col_off"].cast(pa.int32()),
                "h": t["h"].cast(pa.int32()),
                "w": t["w"].cast(pa.int32()),
                "bands": t["bands"].cast(pa.int32()),
                "cell": t["cell"].cast(pa.uint64()),
                "pixels": t["pixels"].cast(pa.binary())}),
            batch_format="pyarrow")

    out = morphology.morph_open_tiles(to_ds(tiles_of(z, 4)),
                                      threshold=2500).to_pandas()

    # independent full-image replay (same as the sidecar spec)
    fg = (z > 2500).astype(np.int64)

    def shrink3(a, pad, op):
        p = np.pad(a, 1, constant_values=pad)
        o = a.copy()
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                o = op(o, p[1 + dr:1 + dr + a.shape[0],
                            1 + dc:1 + dc + a.shape[1]])
        return o

    opened = shrink3(shrink3(fg, 1, np.minimum), 0, np.maximum)
    assert opened.sum() > 0 and opened.sum() < fg.sum()
    for _, r in out.iterrows():
        ro, co = int(r["row_off"]), int(r["col_off"])
        sub = opened[ro:ro + 4, co:co + 4]
        ii, jj = np.nonzero(sub)
        assert r["n_open"] == len(ii), (ro, co)
        assert r["open_wsum"] == int(
            ((ii + ro) * np.int64(100003) + jj + co).sum()), (ro, co)


def test_hull_monotone_equals_gift_wrap_property():
    """The engine hull (monotone chain) and the oracle hull (gift
    wrapping) must produce the same minimal vertex SET on random,
    collinear, and grid point sets."""
    from unmixing_ray.stages.hull import hull_monotone, hull_gift_wrap
    rng = np.random.default_rng(7)
    for trial in range(400):
        kind = trial % 4
        if kind == 0:
            pts = rng.integers(0, 12, size=(int(rng.integers(1, 30)), 2))
        elif kind == 1:
            t = rng.integers(0, 10, size=int(rng.integers(1, 10)))
            pts = np.stack([t, 2 * t + 1], axis=1)
        elif kind == 2:
            pts = np.array([(x, y) for x in range(4) for y in range(4)])
        else:
            pts = rng.integers(-5, 5, size=(int(rng.integers(1, 50)), 2))
        a = set(map(tuple, hull_monotone(pts)))
        b = set(map(tuple, hull_gift_wrap(pts)))
        assert a == b, (trial, pts)


def test_hull_of_hulls_combiner_is_lossless():
    """hull(tile hulls' union) == hull(all points): splitting a point
    set into arbitrary subsets and hulling each first never loses a
    global hull vertex."""
    from unmixing_ray.stages.hull import hull_monotone
    rng = np.random.default_rng(11)
    for _ in range(100):
        pts = rng.integers(0, 40, size=(200, 2))
        whole = set(map(tuple, hull_monotone(pts)))
        parts = np.array_split(pts, 7)
        cand = np.vstack([hull_monotone(p) for p in parts if len(p)])
        again = set(map(tuple, hull_monotone(cand)))
        assert whole == again


def test_caption_consistency_flags_diverging_captions(ray_session):
    """The %97 duplicate plant copies PIXELS but draws a fresh caption,
    so every planted cluster must be flagged inconsistent."""
    import __ray_entry__ as entrymod
    out = entrymod.queries()["caption_consistency"](
        "/root/testdata/sf0.01").to_pandas()
    assert len(out) >= 10
    assert (out["n_imgs"] >= 2).all()
    assert (out["consistent"] == 0).any()
    assert (out["n_captions"] > 1).equals(out["consistent"] == 0)


def test_spatial_split_is_block_coherent(ray_session):
    """Leakage safety: every tile of a block shares one fold, and the
    corpus produces at least two folds (non-vacuous rates)."""
    import __ray_entry__ as entrymod
    out = entrymod.queries()["spatial_split"](
        "/root/testdata/sf0.01").to_pandas()
    per_block = out.groupby(["bx", "by"])["split"].nunique()
    assert (per_block == 1).all()
    assert out["split"].nunique() >= 2


def test_attribution_hand_case(ray_session):
    """user 1: purchase at t=100s with clicks at 50s and 99s (2
    touches -> credit floor(S/2)*2 = S); purchase at t=300000s with no
    trailing-24h click -> unattributed. S = 720720."""
    S = 720_720
    rows = [
        (1, 1, 50 * US, "click"), (2, 1, 99 * US, "click"),
        (3, 1, 100 * US, "purchase"),
        (4, 1, 300_000 * US, "purchase"),
        (5, 2, 10 * US, "click"),
    ]
    out = ev.attribution(_events(rows)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    assert list(out["day"]) == [0, 3]
    assert list(out["n_probes"]) == [1, 1]
    assert list(out["n_unattributed"]) == [0, 1]
    assert list(out["credit_sum"]) == [S, 0]


def test_attribution_credit_is_exact_thirds(ray_session):
    """3 touches -> floor(S/3)*3 == S exactly (S = lcm(1..16))."""
    S = 720_720
    rows = [(i, 1, i * US, "click") for i in range(3)]
    rows.append((9, 1, 10 * US, "purchase"))
    out = ev.attribution(_events(rows)).to_pandas()
    assert out["credit_sum"].iloc[0] == S


def test_dp_simplify_iterative_equals_recursive():
    """Engine stack DP vs an independent recursion on random convex
    chains (and the kept set must always include the endpoints)."""
    from unmixing_ray.stages.hull import (chains_of, dp_simplify_chain,
                                          hull_monotone)

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    def dp_rec(chain, e2):
        if len(chain) <= 2:
            return [tuple(p) for p in chain]
        a, b = tuple(chain[0]), tuple(chain[-1])
        seg2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
        bi, bc2 = -1, -1
        for i in range(1, len(chain) - 1):
            c = cross(a, b, tuple(chain[i]))
            if c * c > bc2:
                bi, bc2 = i, c * c
        if bc2 > e2 * seg2:
            return dp_rec(chain[:bi + 1], e2) + dp_rec(chain[bi:], e2)[1:]
        return [a, b]

    rng = np.random.default_rng(3)
    shrunk = 0
    for _ in range(200):
        pts = rng.integers(0, 64, size=(int(rng.integers(3, 120)), 2))
        h = hull_monotone(pts)
        for chain in chains_of(h):
            for eps in (1, 2, 4):
                it = set(map(tuple, dp_simplify_chain(chain, eps)))
                rc = set(dp_rec(chain, eps * eps))
                assert it == rc
                assert tuple(chain[0]) in it and tuple(chain[-1]) in it
                if len(it) < len(chain):
                    shrunk += 1
    assert shrunk > 50   # the op is non-vacuous on these inputs


def test_interarrival_frexp_bucket_is_bit_length(ray_session):
    """The frexp-exponent bucket must equal int.bit_length on exact
    powers of two and their neighbors (the float-log failure points)."""
    vals = []
    for k in range(1, 50):
        vals += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    g = np.array(vals, dtype=np.int64)
    _m, ex = np.frexp(g.astype(np.float64))
    want = np.array([int(v).bit_length() for v in vals])
    assert (ex == want).all()


def test_winsorized_brute_force(ray_session):
    """grouped_winsorized vs a single-machine replay on a skewed
    integer table (incl. the percentile_disc rank definition)."""
    import math
    from unmixing_ray.stages.relational import grouped_winsorized
    rng = np.random.default_rng(17)
    k = rng.integers(0, 3, size=500)
    v = (rng.pareto(1.5, size=500) * 100).astype(np.int64)
    df = pd.DataFrame({"k": k, "v": v})
    out = grouped_winsorized(
        ray.data.from_pandas(df).repartition(7), "k", "v",
        trim=0.1).set_index("k")
    for kv, g in df.groupby("k"):
        s = np.sort(g["v"].to_numpy())
        n = len(s)
        lo = s[min(max(math.ceil(n * 0.1) - 1, 0), n - 1)]
        hi = s[min(max(math.ceil(n * 0.9) - 1, 0), n - 1)]
        assert out.loc[kv, "lo"] == lo and out.loc[kv, "hi"] == hi
        assert out.loc[kv, "n"] == n
        assert out.loc[kv, "wins_sum"] == int(
            np.clip(g["v"].to_numpy(), lo, hi).sum())


def test_profile_table_refuses_floats(ray_session):
    from unmixing_ray.stages.relational import profile_table
    df = pd.DataFrame({"a": [1.5, 2.5]})
    ds = ray.data.from_pandas(df)
    import pytest as _pytest
    with _pytest.raises(Exception):
        profile_table(ds, ["a"])


def test_dhash_catches_lossy_twin(ray_session):
    """The %97 planted copies must pair at Hamming 0 when stored
    losslessly and within a few bits when one side re-encoded lossily
    (q8) — the case the input phash column cannot catch."""
    import __ray_entry__ as entrymod
    out = entrymod.queries()["dhash_pairs"](
        "/root/testdata/sf0.01").to_pandas()
    assert len(out) >= 10
    assert (out["hamming"] == 0).sum() >= 10
    assert (out["hamming"] > 0).any()


def test_letterbox_flags_nodata_strips(ray_session):
    """Every image carrying the rows-0..3 NODATA strip (including the
    %97 copies of planted images) must report n_top >= 4 and boxed=1;
    a majority of images must be unboxed."""
    import __ray_entry__ as entrymod
    out = entrymod.queries()["letterbox"](
        "/root/testdata/sf0.01").to_pandas()
    assert len(out) == 1200
    boxed = out[out["boxed"] == 1]
    assert (boxed["n_top"] >= 4).sum() >= 150
    assert (out["boxed"] == 0).sum() > 800


def test_lcs_kernel_hand_cases():
    from unmixing_ray.stages.dedup import _lcs_len
    assert _lcs_len("", "abc") == 0
    assert _lcs_len("abc", "abc") == 3
    assert _lcs_len("abcde", "ace") == 3
    assert _lcs_len("AGGTAB", "GXTXAYB") == 4
    assert _lcs_len("abc", "xyz") == 0

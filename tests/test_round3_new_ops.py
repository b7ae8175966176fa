"""Batching/partitioning invariance + contract pins for the
continuation-session-5 operators (trend, enhance, curate, quantize,
split)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _skew_tiles(ray_session, batch_size):
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages import decode as dstage
    corpus = synth.ensure_skewed_corpus(SF)
    ds = images.read_images(corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=batch_size)


def test_temporal_trend_batching_invariant(ray_session):
    """The associative-partials reduce must be bit-identical at any
    batch size (different per-batch pre-aggregation splits)."""
    from unmixing_ray.stages import trend
    key = ["cell_ix", "cell_iy", "row_off", "col_off"]
    a = trend.temporal_trend(_skew_tiles(ray_session, 4)).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    b = trend.temporal_trend(_skew_tiles(ray_session, 64)).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_dates"] > 1).any()          # the planted hot stack
    single = a[a["n_dates"] == 1]
    assert (single["trend_den"] == 0).all()  # undefined slope is 0/0


def test_temporal_trend_overflow_guard():
    """finish() must raise, never wrap, past the int64 exact domain."""
    import pyarrow as pa
    from unmixing_ray.stages import trend
    big = pa.table({
        "cell_ix": pa.array([1], pa.int64()),
        "cell_iy": pa.array([1], pa.int64()),
        "row_off": pa.array([0], pa.int64()),
        "col_off": pa.array([0], pa.int64()),
        "n": pa.array([2 ** 31], pa.int64()),
        "st": pa.array([1], pa.int64()),
        "st2": pa.array([1], pa.int64()),
        "sy": pa.array([1], pa.int64()),
        "sty": pa.array([2 ** 33], pa.int64())})
    # reach the inner finish through a tiny fake aggregate output
    import unmixing_ray.stages.trend as t

    class FakeAgg:
        def map_batches(self, fn, batch_format):
            with pytest.raises(OverflowError):
                fn(big)
            return "raised"

    class FakeTiles:
        def select_columns(self, cols):
            return self

        def map_batches(self, *a, **k):
            return self

        def groupby(self, keys):
            return self

        def aggregate(self, *a):
            return FakeAgg()

    assert t.temporal_trend(FakeTiles()) == "raised"


def test_equalize_batching_invariant_and_lut(ray_session):
    """Two-pass equalization is exact at any batch size; the LUT is
    monotone nondecreasing into [0, levels-1]."""
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages import decode as dstage
    from unmixing_ray.stages import enhance

    def tiles(bs):
        corpus = synth.ensure_corpus(SF)
        ds = images.read_images(corpus)
        fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                         cell_level=synth.CELL_LEVEL)
        return ds.map_batches(fn, batch_format="pyarrow", batch_size=bs)

    lut = enhance.fit_equalize_lut(tiles(8))
    assert lut.min() >= 0 and lut.max() <= 255
    assert (np.diff(lut, axis=1) >= 0).all()
    key = ["tile_id", "band"]
    a = enhance.equalize_tiles(tiles(8)).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    b = enhance.equalize_tiles(tiles(64)).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_split_assign_growth_stable(ray_session):
    """A row's split never changes when the corpus grows (pure fn of
    id), and every split is non-empty at 500 docs."""
    import ray.data
    from unmixing_ray.stages import relational
    ids = list(range(500))
    full = relational.split_assign(
        ray.data.from_items([{"doc_id": i} for i in ids]), "doc_id") \
        .to_pandas().set_index("doc_id")["split"]
    half = relational.split_assign(
        ray.data.from_items([{"doc_id": i} for i in ids[:250]]),
        "doc_id").to_pandas().set_index("doc_id")["split"]
    pd.testing.assert_series_equal(half, full.loc[half.index])
    assert set(full.unique()) == {"train", "val", "test"}


def test_quantize_int8_bounds(ray_session):
    """Quantized summaries respect |q_i| <= 127 (so q_l1 <= 127*d) and
    the max-|x| dim hits exactly +/-127 via floor semantics."""
    import ray.data
    from unmixing_ray.stages import ann
    rng = np.random.default_rng(5)
    rows = [{"vec_id": i,
             "embedding": rng.normal(size=8).astype(np.float32)}
            for i in range(50)]
    rows.append({"vec_id": 50,
                 "embedding": np.zeros(8, np.float32)})   # zero vector
    out = ann.quantize_int8(ray.data.from_items(rows)).to_pandas()
    assert (out["q_l1"] <= 127 * out["n_dims"]).all()
    z = out[out["vec_id"] == 50].iloc[0]
    assert z["q_sum"] == 0 and z["q_l1"] == 0 and z["scale_u6"] == 0


def test_approx_quantiles_error_bound(ray_session):
    """Bottom-m sketch quantiles: percentile-rank error <= 2.5/sqrt(m)
    vs the exact sorted column, and the sketch is partitioning-
    invariant (pure-hash ranks)."""
    import ray.data
    from unmixing_ray.stages import relational
    ds = ray.data.read_parquet("/root/testdata/sf0.01/events.parquet") \
        .select_columns(["event_id", "value"])
    m = 2048
    got = relational.approx_quantiles(ds, "value", qs=(0.1, 0.5, 0.9),
                                      sample_size=m, id_col="event_id")
    exact = np.sort(ds.to_pandas()["value"].to_numpy())
    tol = 2.5 / np.sqrt(m)
    for q, v in zip(got["q"], got["value"]):
        rank = np.searchsorted(exact, v) / len(exact)
        assert abs(rank - q) <= tol, (q, v, rank)
    # partitioning invariance: same result from a repartitioned input
    got2 = relational.approx_quantiles(
        ds.repartition(17), "value", qs=(0.1, 0.5, 0.9),
        sample_size=m, id_col="event_id")
    assert list(got["value"]) == list(got2["value"])


def test_build_lut_known_histogram():
    """Classic histeq identity checks on a hand-computed histogram:
    cdf-min form maps the lowest occupied bin to 0 and the highest to
    levels-1; empty bands map to all-zero."""
    from unmixing_ray.stages.enhance import build_lut
    hist = np.zeros((2, 8), dtype=np.int64)
    hist[0, 2] = 10      # lowest occupied -> 0
    hist[0, 5] = 30
    hist[0, 7] = 60      # highest occupied -> levels-1
    lut = build_lut(hist, levels=256)
    assert lut[0, 2] == 0
    assert lut[0, 7] == 255
    # middle bin: (cdf-cdfmin)*(L-1)//(N-cdfmin) = (40-10)*255//90 = 85
    assert lut[0, 5] == 85
    # bins below the first occupied one are clamped to 0
    assert (lut[0, :2] == 0).all()
    # band 1 is empty -> all zeros
    assert (lut[1] == 0).all()


def test_streaming_dedup_exactly_once(ray_session):
    """Sharded admission index admits EXACTLY one copy of each
    distinct content at any parallelism (which copy is arbitrary)."""
    import ray.data
    from unmixing_ray.stages import state_dedup
    rows = [{"doc_id": i, "text": "content %d" % (i % 40)}
            for i in range(400)]
    ds = ray.data.from_items(rows).repartition(16)
    out = state_dedup.streaming_exact_dedup(ds, num_shards=4) \
        .to_pandas()
    assert len(out) == 40
    assert out["content_hash"].nunique() == 40
    assert set(out["text"]) == {"content %d" % i for i in range(40)}


def test_epoch_change_batching_invariant_and_semantics(ray_session):
    """epoch_change must be bit-identical at any batch size, and its
    per-position counts must sum to the trend pass's n_dates (same
    tiles, two different partial shapes)."""
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import trend
    key = ["cell_ix", "cell_iy", "row_off", "col_off"]
    t_split = synth.n_images_for_sf(synth.sf_of_dir(SF)) // 4
    a = trend.epoch_change(_skew_tiles(ray_session, 4), t_split) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    b = trend.epoch_change(_skew_tiles(ray_session, 64), t_split) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    n = trend.temporal_trend(_skew_tiles(ray_session, 64)).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    assert (a["n_early"] + a["n_late"]).tolist() == n["n_dates"].tolist()
    # the skewed corpus stacks dates on a hot position: both epochs must
    # be non-vacuously populated there
    hot = a[(a["n_early"] > 1) & (a["n_late"] > 1)]
    assert len(hot) > 0
    assert (hot["delta_den"] ==
            hot["n_early"] * hot["n_late"]).all()


def test_line_dedup_contract(ray_session):
    """Cross-doc duplicate chunks drop from EVERY holder; a chunk
    repeated only within one doc is kept; reconstruction preserves
    order; result is batching-invariant."""
    import ray.data
    from unmixing_ray.stages import text as tstage
    w = lambda *toks: " ".join(toks)
    dup = w(*(f"d{i}" for i in range(4)))       # shared 4-token chunk
    rows = [
        {"doc_id": 1, "text": dup + " " + w("a1", "a2", "a3", "a4")},
        {"doc_id": 2, "text": w("b1", "b2", "b3", "b4") + " " + dup},
        # chunk repeated within ONE doc only -> kept (both copies)
        {"doc_id": 3, "text": w("c1", "c2", "c3", "c4") + " " +
                              w("c1", "c2", "c3", "c4")},
        # partial tail chunk, unique -> kept
        {"doc_id": 4, "text": w("e1", "e2")},
    ]
    for bs in (1, 4):
        ds = ray.data.from_items(rows).map_batches(
            lambda df: df, batch_format="pandas", batch_size=bs)
        out = tstage.line_dedup(ds, chunk=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["n_chunks"].tolist() == [2, 2, 2, 1]
        assert out["n_dropped"].tolist() == [1, 1, 0, 0]
        assert out.loc[0, "clean_text"] == w("a1", "a2", "a3", "a4")
        assert out.loc[1, "clean_text"] == w("b1", "b2", "b3", "b4")
        assert out.loc[2, "clean_text"] == rows[2]["text"]
        assert out.loc[3, "clean_text"] == w("e1", "e2")


def test_global_rank_bucket_invariant(ray_session):
    """Ranks are exact and identical at any bucket count / sketch size
    (the bucket layout is an execution detail); ties on the order
    column are broken by id and never straddle bucket boundaries."""
    import ray.data
    from unmixing_ray.stages import relational
    rng = np.random.default_rng(3)
    n = 700
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 40, n).astype(np.int64)})  # heavy ties
    expected = df.sort_values(["v", "id"]).reset_index(drop=True)
    expected["rank"] = np.arange(1, n + 1, dtype=np.int64)
    for nb, m in ((4, 64), (16, 256), (64, 4096)):
        ds = ray.data.from_pandas(df).repartition(7)
        out = relational.global_rank(ds, "v", "id", n_buckets=nb,
                                     sample_size=m).to_pandas() \
            .sort_values("rank").reset_index(drop=True)
        assert out["rank"].tolist() == expected["rank"].tolist()
        assert out["id"].tolist() == expected["id"].tolist()
        assert out["v"].tolist() == expected["v"].tolist()


def test_composite_cube_batching_invariant_and_fill(ray_session):
    """The cube must be bit-identical at any batch size, dense over all
    bins, and forward fill must point at the newest earlier non-empty
    bin with that bin's exact (n, sum)."""
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import trend
    key = ["cell_ix", "cell_iy", "row_off", "col_off", "bin"]
    tc = synth.n_images_for_sf(synth.sf_of_dir(SF))
    a = trend.composite_cube(_skew_tiles(ray_session, 4), 6, tc) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    b = trend.composite_cube(_skew_tiles(ray_session, 64), 6, tc) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # dense: every observed position carries all 6 bins
    per_pos = a.groupby(["cell_ix", "cell_iy", "row_off", "col_off"])
    assert (per_pos["bin"].count() == 6).all()
    # fill contract: empty bins inherit the newest earlier composite
    empty = a[a["n_obs"] == 0]
    assert len(empty) > 0          # grid images observe only one bin
    filled = empty[empty["fill_bin"] >= 0]
    assert len(filled) > 0
    merged = filled.merge(
        a, left_on=["cell_ix", "cell_iy", "row_off", "col_off",
                    "fill_bin"],
        right_on=["cell_ix", "cell_iy", "row_off", "col_off", "bin"],
        suffixes=("", "_src"))
    assert (merged["fill_n"] == merged["n_obs_src"]).all()
    assert (merged["fill_sum"] == merged["sum_b0_src"]).all()
    # bins before the first observation are unfilled markers
    pre = empty[empty["fill_bin"] < 0]
    assert (pre["fill_n"] == 0).all() and (pre["fill_sum"] == 0).all()


def test_flow_accumulation_matches_driver_replay(ray_session):
    """flow_accumulation_lattice vs an independent driver replay on a
    random occupied lattice: downstream pick (lowest strictly-lower
    occupied 4-neighbor, precedence tiebreak) + capped mass hops."""
    import ray.data
    from unmixing_ray.stages import terrain

    rng = np.random.default_rng(11)
    PACK = 1 << 21
    pts = set()
    while len(pts) < 300:
        pts.add((int(rng.integers(0, 24)), int(rng.integers(0, 24))))
    pts = sorted(pts)
    v = np.array([ix * PACK + iy for ix, iy in pts], dtype=np.int64)

    def elev(ix, iy):
        return (ix * 1000003 + iy * 7919) % 104729

    occupied = set(pts)
    down = {}
    for ix, iy in pts:
        e0 = elev(ix, iy)
        best = None
        for prec, (dx, dy) in enumerate([(1, 0), (0, 1),
                                         (-1, 0), (0, -1)]):
            t = (ix + dx, iy + dy)
            if t in occupied and elev(*t) < e0:
                key = (elev(*t), prec)
                if best is None or key < best[0]:
                    best = (key, t)
        if best is not None:
            down[(ix, iy)] = best[1]

    rounds = 3
    f = {t: 0 for t in pts}
    for s, t in down.items():
        f[t] = f.get(t, 0) + 1
    acc = dict(f)
    frontier = f
    for _ in range(rounds - 1):
        nxt = {}
        for node, m in frontier.items():
            if m and node in down:
                t = down[node]
                nxt[t] = nxt.get(t, 0) + m
        for node, m in nxt.items():
            acc[node] = acc.get(node, 0) + m
        frontier = nxt
    want = {k: m for k, m in acc.items() if m > 0}

    nodes = ray.data.from_pandas(pd.DataFrame({"v": v}))
    got = terrain.flow_accumulation_lattice(nodes, rounds=rounds)\
        .to_pandas()
    got_map = {(int(r.ix), int(r.iy)): int(r.acc)
               for r in got.itertuples()}
    assert got_map == want
    assert len(want) > 50          # non-vacuous
    assert max(want.values()) >= 3  # multi-hop mass actually flowed


def test_basin_label_matches_driver_replay(ray_session):
    """basin_label_lattice vs an independent driver replay: follow
    the downstream pointer exactly 2**doublings hops (pits
    self-loop)."""
    import ray.data
    from unmixing_ray.stages import terrain

    rng = np.random.default_rng(23)
    PACK = 1 << 21
    pts = set()
    while len(pts) < 250:
        pts.add((int(rng.integers(0, 22)), int(rng.integers(0, 22))))
    pts = sorted(pts)

    def elev(ix, iy):
        return (ix * 1000003 + iy * 7919) % 104729

    occupied = set(pts)
    down = {}
    for ix, iy in pts:
        e0 = elev(ix, iy)
        best = None
        for prec, (dx, dy) in enumerate([(1, 0), (0, 1),
                                         (-1, 0), (0, -1)]):
            t = (ix + dx, iy + dy)
            if t in occupied and elev(*t) < e0:
                key = (elev(*t), prec)
                if best is None or key < best[0]:
                    best = (key, t)
        down[(ix, iy)] = best[1] if best else (ix, iy)

    doublings = 3
    want = {}
    for node in pts:
        cur = node
        for _ in range(2 ** doublings):
            cur = down[cur]
        want[node] = cur

    v = np.array([ix * PACK + iy for ix, iy in pts], dtype=np.int64)
    nodes = ray.data.from_pandas(pd.DataFrame({"v": v}))
    got = terrain.basin_label_lattice(nodes, doublings=doublings)\
        .to_pandas()
    got_map = {(int(r.ix), int(r.iy)): (int(r.basin_ix),
                                        int(r.basin_iy))
               for r in got.itertuples()}
    assert got_map == want
    # non-vacuous: labels actually move mass across multiple hops
    moved = sum(1 for k, t in want.items() if k != t)
    assert moved > 150
    assert len(set(want.values())) < len(pts)


def test_morans_ingredients_brute_force(ray_session):
    """morans_ingredients vs a driver all-pairs replay on a random
    valued lattice, plus the hand case of a 1x2 domino."""
    import ray.data
    from unmixing_ray.stages import rollup

    PACK = 1 << 21
    rng = np.random.default_rng(7)
    pts = {}
    while len(pts) < 200:
        pts[(int(rng.integers(0, 20)),
             int(rng.integers(0, 20)))] = int(rng.integers(1, 9))
    v = np.array([ix * PACK + iy for ix, iy in pts], dtype=np.int64)
    val = np.array(list(pts.values()), dtype=np.int64)

    w = deg_v = cross = 0
    for (ix, iy), a in pts.items():
        for dx, dy in [(1, 0), (0, 1), (-1, 0), (0, -1)]:
            t = (ix + dx, iy + dy)
            if t in pts:
                w += 1
                deg_v += a
                cross += a * pts[t]

    cells = ray.data.from_pandas(pd.DataFrame({"v": v, "val": val}))
    got = rollup.morans_ingredients(cells)
    assert int(got["n"][0]) == len(pts)
    assert int(got["sum_v"][0]) == int(val.sum())
    assert int(got["sum_v2"][0]) == int((val * val).sum())
    assert int(got["w_pairs"][0]) == w
    assert int(got["sum_deg_v"][0]) == deg_v
    assert int(got["sum_cross"][0]) == cross
    assert w > 100  # non-vacuous adjacency

    # domino: two cells (0,0)=2, (0,1)=5 -> W=2, cross=2*5*2=20
    cells2 = ray.data.from_pandas(pd.DataFrame({
        "v": np.array([0, 1], dtype=np.int64),
        "val": np.array([2, 5], dtype=np.int64)}))
    got2 = rollup.morans_ingredients(cells2)
    assert got2.iloc[0].to_dict() == {
        "n": 2, "sum_v": 7, "sum_v2": 29, "w_pairs": 2,
        "sum_deg_v": 7, "sum_cross": 20}

"""Unit/property tests for the distributed relational operators
(stages/relational.py): results must equal the single-machine pandas
reference at every batch size (combiner correctness), and the quantile
selection must stay exact when its sampling brackets miss."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages import relational


def _orders(n=500, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "seg": rng.choice(["A", "B", "C"], n),
        "key": np.arange(n, dtype=np.int64),
        "val": rng.integers(0, 200, n).astype(np.int64),
    })


@pytest.mark.parametrize("nblocks", [1, 7])
def test_grouped_topk_matches_pandas(ray_session, nblocks):
    df = _orders()
    ds = ray.data.from_pandas(df).repartition(nblocks)
    got = relational.grouped_topk(
        ds, "seg", "val", k=5, descending=True,
        tiebreak=("key",)).to_pandas()
    want = df.sort_values(["seg", "val", "key"],
                          ascending=[True, False, True])\
        .groupby("seg").head(5)
    want = want.assign(rank=want.groupby("seg").cumcount() + 1)
    g = got.sort_values(["seg", "rank"]).reset_index(drop=True)
    w = want.sort_values(["seg", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["seg", "key", "val", "rank"]],
        w[["seg", "key", "val", "rank"]])


@pytest.mark.parametrize("nblocks", [1, 7])
def test_count_distinct_matches_pandas(ray_session, nblocks):
    df = _orders()
    ds = ray.data.from_pandas(df).repartition(nblocks)
    got = relational.count_distinct(ds, "seg", "val").to_pandas()\
        .sort_values("seg").reset_index(drop=True)
    want = df.groupby("seg")["val"].nunique().reset_index()\
        .rename(columns={"val": "n_distinct"})
    assert got["seg"].tolist() == want["seg"].tolist()
    assert got["n_distinct"].tolist() == want["n_distinct"].tolist()


def test_anti_join_matches_pandas(ray_session):
    df = _orders()
    right = pd.DataFrame(
        {"rkey": np.arange(0, 500, 3, dtype=np.int64)})
    left = ray.data.from_pandas(df).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)
    got = relational.anti_join(left, rds, "key", right_key="rkey")\
        .to_pandas().sort_values("key").reset_index(drop=True)
    want = df[~df["key"].isin(right["rkey"])]\
        .sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["seg", "key", "val"]],
                                  want[["seg", "key", "val"]])


def test_anti_join_empty_right(ray_session):
    df = _orders(50)
    left = ray.data.from_pandas(df)
    rds = ray.data.from_pandas(
        pd.DataFrame({"rkey": np.array([], dtype=np.int64)}))
    got = relational.anti_join(left, rds, "key", right_key="rkey")\
        .to_pandas()
    assert len(got) == 50


def _disc_expected(vals, q):
    v = np.sort(vals)
    return v[min(max(int(math.ceil(len(v) * q)) - 1, 0), len(v) - 1)]


@pytest.mark.parametrize("nblocks", [1, 9])
def test_grouped_quantile_disc_exact(ray_session, nblocks):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.choice(["x", "y"], 4000),
        "v": rng.normal(size=4000) * 100})
    ds = ray.data.from_pandas(df).repartition(nblocks)
    got = relational.grouped_quantile_disc(
        ds, "k", "v", qs=(0.5, 0.9, 0.99))
    for _, row in got.iterrows():
        sub = df[df["k"] == row["k"]]["v"].to_numpy()
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            assert row[col] == _disc_expected(sub, q), (row["k"], q)


def test_grouped_quantile_disc_refinement_path(ray_session):
    # adversarial batching: each block holds a disjoint value range, so
    # per-batch grid pivots misplace the global quantile and the
    # geometric pad-doubling refinement must fire — the result must
    # still be exact
    blocks = [pd.DataFrame({"k": "z", "v": np.arange(i * 1000,
                                                     (i + 1) * 1000,
                                                     dtype=np.float64)})
              for i in range(8)]
    ds = ray.data.from_pandas(blocks)
    got = relational.grouped_quantile_disc(
        ds, "k", "v", qs=(0.5, 0.99), grid=5, band_pad=1)
    all_v = np.arange(8000, dtype=np.float64)
    assert got.loc[0, "p50"] == _disc_expected(all_v, 0.5)
    assert got.loc[0, "p99"] == _disc_expected(all_v, 0.99)


def test_grouped_quantile_max_keys_is_loud(ray_session):
    # the selection core holds one compact pooled CDF per key on the
    # driver — at an inflated key count it must REFUSE loudly and route
    # to the shuffled path, never grow driver state with the key space
    # (VERDICT r03 item 2)
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                       "v": rng.normal(size=200)})
    ds = ray.data.from_pandas(df).repartition(4)
    with pytest.raises(RuntimeError, match="grouped_quantile_shuffled"):
        relational.grouped_quantile_disc(ds, "k", "v", qs=(0.5,),
                                         max_keys=50)


def test_grouped_quantile_driver_state_is_key_compact(ray_session):
    # driver-held pooled CDF rows are fixed-width per key (<= 4*grid+1
    # points) regardless of how many batches contributed — the
    # O(n_batches x keys x grid) sampling rows pool inside a
    # groupby(key) stage, not on the driver (VERDICT r03 item 2)
    blocks = [pd.DataFrame({"k": "z", "v": rng_v})
              for rng_v in np.split(
                  np.random.default_rng(5).normal(size=12_000), 24)]
    ds = ray.data.from_pandas(blocks)
    grid = 9
    lean = ds.map_batches(lambda t: t.select(["k", "v"]),
                          batch_format="pyarrow")
    pooled = relational._pool_cdfs(lean, "k", "v", grid).to_pandas()
    # 24 batches x grid=9 = 216 raw pooled points; the collected row
    # must carry at most 4*grid+1 = 37
    assert len(pooled) == 1
    assert pooled.loc[0, "n"] == 12_000
    assert len(pooled.loc[0, "vals"]) <= 4 * grid + 1
    # endpoints survive the downsample (bracket-convergence guarantee)
    all_v = np.concatenate([b["v"].to_numpy() for b in blocks])
    assert pooled.loc[0, "vals"][0] == all_v.min()
    assert pooled.loc[0, "vals"][-1] == all_v.max()
    # and exactness survives the compact pooling
    got = relational.grouped_quantile_disc(ds, "k", "v", qs=(0.5,),
                                           grid=grid)
    assert got.loc[0, "p50"] == _disc_expected(all_v, 0.5)


def test_grouped_quantile_shuffled_matches_disc(ray_session):
    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "k": rng.integers(0, 40, 4000).astype(np.int64),
        "v": rng.normal(size=4000) * 100})
    ds = ray.data.from_pandas(df).repartition(7)
    got = relational.grouped_quantile_shuffled(
        ds, "k", "v", qs=(0.5, 0.9)).to_pandas()\
        .sort_values("k").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["k"] == row["k"]]["v"].to_numpy()
        assert row["p50"] == _disc_expected(sub, 0.5)
        assert row["p90"] == _disc_expected(sub, 0.9)


def test_grouped_quantile_band_cap_is_loud(ray_session):
    df = pd.DataFrame({"k": "z",
                       "v": np.arange(1000, dtype=np.float64)})
    ds = ray.data.from_pandas(df)
    with pytest.raises(RuntimeError, match="band_cap"):
        relational.grouped_quantile_disc(ds, "k", "v", qs=(0.5,),
                                         band_cap=3)


def test_bigram_topk_matches_counter(ray_session):
    from collections import Counter
    import re
    from unmixing_ray.stages import text as text_stage
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta"]
    docs = [" ".join(rng.choice(words, rng.integers(2, 30)))
            for _ in range(200)]
    df = pd.DataFrame({"text": docs})
    tok = re.compile(r"[a-z0-9]+")
    c = Counter()
    for s in docs:
        ts = tok.findall(s.lower())
        c.update(ts[i] + " " + ts[i + 1] for i in range(len(ts) - 1))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = text_stage.bigram_topk(
        ray.data.from_pandas(df).repartition(6), k=5).to_pandas()
    assert list(zip(got["bigram"], got["n_total"])) == want


def test_bernoulli_sample_deterministic(ray_session):
    df = _orders(2000)
    ds = ray.data.from_pandas(df)
    a = relational.bernoulli_sample(ds.repartition(1), "key", 0.1,
                                    seed=3).to_pandas()
    b = relational.bernoulli_sample(ds.repartition(8), "key", 0.1,
                                    seed=3).to_pandas()
    assert sorted(a["key"]) == sorted(b["key"])
    # rate lands in a sane band and a different seed gives a
    # different (but overlapping-at-random) subset
    assert 0.05 < len(a) / len(df) < 0.16
    c = relational.bernoulli_sample(ds, "key", 0.1, seed=4).to_pandas()
    assert sorted(c["key"]) != sorted(a["key"])


def test_stratified_sample_exact_n(ray_session):
    df = _orders(900)
    ds = ray.data.from_pandas(df).repartition(6)
    out = relational.stratified_sample(ds, "seg", "key", n=7)\
        .to_pandas()
    sizes = out.groupby("seg").size()
    assert (sizes == 7).all()
    # deterministic across batching
    out1 = relational.stratified_sample(
        ray.data.from_pandas(df), "seg", "key", n=7).to_pandas()
    assert sorted(out["key"]) == sorted(out1["key"])


def test_hll_error_bound(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": np.repeat(["a", "b"], 30000),
        "v": np.concatenate([rng.integers(0, 20000, 30000),
                             rng.integers(0, 400, 30000)])})
    ds = ray.data.from_pandas(df).repartition(10)
    got = relational.approx_count_distinct(ds, "k", "v").to_pandas()\
        .set_index("k")["approx_distinct"]
    want = df.groupby("k")["v"].nunique()
    for k in ("a", "b"):
        rel = abs(got[k] - want[k]) / want[k]
        assert rel < 0.05, (k, got[k], want[k])


def test_pivot_count_matches_pandas(ray_session):
    import ray.data
    from unmixing_ray.stages.relational import pivot_count
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.integers(0, 20, 500),
        "c": rng.choice(["a", "b", "c"], 500)})
    got = pivot_count(ray.data.from_pandas(df), "k", "c", ["a", "b", "c"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = pd.crosstab(df["k"], df["c"]).reindex(
        columns=["a", "b", "c"], fill_value=0)
    for c in ("a", "b", "c"):
        assert (got[f"n_{c}"].to_numpy() == want[c].to_numpy()).all()
    assert (got["n_total"].to_numpy() == want.sum(axis=1).to_numpy()).all()


def test_pivot_count_rejects_undeclared_category(ray_session):
    import pytest as _pytest
    import ray.data
    from unmixing_ray.stages.relational import pivot_count
    df = pd.DataFrame({"k": [1, 2], "c": ["a", "z"]})
    with _pytest.raises(Exception, match="not in the declared"):
        pivot_count(ray.data.from_pandas(df), "k", "c", ["a", "b"]) \
            .to_pandas()


def test_hash_join_matches_pandas(ray_session):
    rng = np.random.default_rng(13)
    left = pd.DataFrame({
        "k": rng.integers(0, 30, 200),
        "lv": rng.integers(0, 1000, 200)})
    right = pd.DataFrame({
        "k": rng.integers(0, 40, 300),   # some keys unmatched both ways
        "rv": rng.integers(0, 1000, 300)})
    for how in ("inner", "left", "right", "outer"):
        got = relational.hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", how=how).to_pandas()
        want = left.merge(right, on="k", how=how)
        key = ["k", "lv", "rv"]
        got = got.fillna(-1).astype({"lv": "int64", "rv": "int64"}) \
            .sort_values(key).reset_index(drop=True)
        want = want.fillna(-1).astype({"lv": "int64", "rv": "int64"}) \
            .sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[key], want[key])


def test_hash_join_outer_rejects_any_prune(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": [1], "lv": [2]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [1], "rv": [3]}))
    for side in ("left", "right"):
        with pytest.raises(ValueError, match="preserved"):
            relational.hash_join(l, r, "k", how="outer",
                                 bloom_prune=side)
    with pytest.raises(ValueError, match="preserved"):
        relational.hash_join(l, r, "k", how="right",
                             bloom_prune="right")


def test_hash_join_rejects_overlapping_columns(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [3]}))
    with pytest.raises(ValueError, match="both sides"):
        relational.hash_join(l, r, "k")


def test_semi_join_matches_pandas(ray_session):
    df = _orders()
    right = pd.DataFrame(
        {"rkey": np.concatenate([np.arange(0, 500, 3, dtype=np.int64),
                                 np.arange(0, 500, 3, dtype=np.int64)])})
    left = ray.data.from_pandas(df).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)
    got = relational.semi_join(left, rds, "key", right_key="rkey")\
        .to_pandas().sort_values("key").reset_index(drop=True)
    want = df[df["key"].isin(right["rkey"])]\
        .sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["seg", "key", "val"]],
                                  want[["seg", "key", "val"]])
    # left multiplicity preserved, right duplicates don't multiply
    assert len(got) == df["key"].isin(right["rkey"]).sum()


def test_semi_join_empty_right(ray_session):
    df = _orders(50)
    left = ray.data.from_pandas(df).repartition(2)
    rds = ray.data.from_pandas(
        pd.DataFrame({"key": np.array([], dtype=np.int64)}))
    got = relational.semi_join(left, rds, "key")
    assert got.count() == 0


def _zipf_tokens(n=20_000, v=400, seed=3):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, n).clip(1, v)
    return pd.DataFrame({"tok": np.array(["w%04d" % r for r in ranks])})


@pytest.mark.parametrize("nblocks", [1, 9])
def test_heavy_hitters_exact_via_sketch(ray_session, nblocks):
    df = _zipf_tokens()
    ds = ray.data.from_pandas(df).repartition(nblocks)
    got = relational.heavy_hitters(ds, col="tok", k=10, capacity=64,
                                   _force_no_fallback=True)
    vc = df["tok"].value_counts()
    want = pd.DataFrame({"tok": vc.index, "n_total": vc.values})\
        .sort_values(["n_total", "tok"], ascending=[False, True])\
        .head(10).reset_index(drop=True)
    got = got.reset_index(drop=True)
    assert got["tok"].tolist() == want["tok"].tolist()
    assert got["n_total"].tolist() == want["n_total"].tolist()


def test_heavy_hitters_fallback_is_still_exact(ray_session):
    # uniform counts defeat the sketch proof -> loud exact fallback
    df = pd.DataFrame({"tok": ["t%03d" % (i % 300) for i in range(3000)]})
    ds = ray.data.from_pandas(df).repartition(6)
    with pytest.warns(UserWarning, match="falling back"):
        got = relational.heavy_hitters(ds, col="tok", k=5, capacity=8,
                                       candidates=8)
    vc = df["tok"].value_counts()
    want = pd.DataFrame({"tok": vc.index, "n_total": vc.values})\
        .sort_values(["n_total", "tok"], ascending=[False, True]).head(5)
    assert got["tok"].tolist() == want["tok"].tolist()
    assert got["n_total"].tolist() == want["n_total"].tolist()


def test_heavy_hitters_counter_fn(ray_session):
    docs = pd.DataFrame({"text": ["a b b c", "b c c d", "c d d d"]})
    ds = ray.data.from_pandas(docs)

    def cf(df):
        from collections import Counter
        c = Counter()
        for s in df["text"]:
            c.update(s.split())
        return c

    got = relational.heavy_hitters(ds, counter_fn=cf, k=2,
                                   key_name="token")
    # c:4, d:4, b:3, a:1 — ties break token-ascending
    assert got["token"].tolist() == ["c", "d"]
    assert got["n_total"].tolist() == [4, 4]


def test_bloom_no_false_negatives(ray_session):
    keys = pd.DataFrame({"k": np.arange(0, 5000, 7, dtype=np.int64)})
    ds = ray.data.from_pandas(keys).repartition(4)
    bm = relational.bloom_from_dataset(ds, "k", bits=1 << 16)
    probe = np.arange(0, 5000, dtype=np.int64)
    hit = relational.bloom_contains(bm, pd.Series(probe), 1 << 16)
    member = (probe % 7 == 0)
    assert hit[member].all()                    # no false negatives
    fp = hit[~member].mean()
    assert fp < 0.2                             # sparse filter, low fp


@pytest.mark.parametrize("side,how", [("left", "inner"),
                                      ("right", "inner"),
                                      ("right", "left")])
def test_hash_join_bloom_parity(ray_session, side, how):
    lf = _orders(300, seed=1).rename(columns={"val": "lval"})
    rf = pd.DataFrame({
        "key": np.arange(0, 300, 5, dtype=np.int64),
        "rval": np.arange(60, dtype=np.int64)})
    lds = ray.data.from_pandas(lf).repartition(4)
    rds = ray.data.from_pandas(rf).repartition(2)
    plain = relational.hash_join(lds, rds, "key", how=how)\
        .to_pandas().sort_values(["key"]).reset_index(drop=True)
    pruned = relational.hash_join(lds, rds, "key", how=how,
                                  bloom_prune=side, bloom_bits=1 << 16)\
        .to_pandas().sort_values(["key"]).reset_index(drop=True)
    cols = sorted(plain.columns)
    pd.testing.assert_frame_equal(
        plain[cols].astype(str), pruned[cols].astype(str))


def test_hash_join_bloom_rejects_left_prune_of_left_join(ray_session):
    lf = _orders(20)
    lds = ray.data.from_pandas(lf)
    with pytest.raises(ValueError, match="preserved side"):
        relational.hash_join(lds, lds.map_batches(
            lambda d: d[["key"]], batch_format="pandas"),
            "key", how="left", bloom_prune="left")


def test_pii_scrub_counts_and_fingerprint(ray_session):
    from unmixing_ray.stages import text as tstage
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["mail bob@x.org or carol@y.co.uk at 10.0.0.1",
                 "call 555-123-4567 and 555-000-1111 no pii else"]})
    got = tstage.pii_scrub(ray.data.from_pandas(docs)).to_pandas()\
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_email"].tolist() == [2, 0]
    assert got["n_ip"].tolist() == [1, 0]
    assert got["n_phone"].tolist() == [0, 2]
    import hashlib
    want0 = hashlib.md5(
        b"mail <EMAIL> or <EMAIL> at <IP>").hexdigest()[:16]
    want1 = hashlib.md5(
        b"call <PHONE> and <PHONE> no pii else").hexdigest()[:16]
    assert got["fp"].tolist() == [want0, want1]


@pytest.mark.parametrize("nblocks", [1, 5])
def test_gopher_repetition_exact(ray_session, nblocks):
    from unmixing_ray.stages import text as tstage
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["a b c a b c a b c",     # grams: 7 total, 3 distinct
                 "x y z w",               # 2 total, 2 distinct
                 "q r"]})                 # shorter than n -> 0
    ds = ray.data.from_pandas(docs).repartition(nblocks)
    got = tstage.gopher_repetition(ds, n=3).to_pandas()\
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_grams"].tolist() == [7, 2, 0]
    assert got["n_distinct"].tolist() == [3, 2, 0]
    assert got["dup_u6"].tolist() == [(7 - 3) * 1_000_000 // 7, 0, 0]


@pytest.mark.parametrize("nblocks", [1, 6])
def test_textprep_decisions_batch_invariant(ray_session, nblocks):
    from unmixing_ray.stages import text as tstage
    rng = np.random.default_rng(5)
    words = ["the", "and", "of", "to", "meadow", "quartz", "violet",
             "summit", "harbor", "lantern"]
    docs, texts = [], []
    for i in range(60):
        n = rng.integers(5, 60)
        texts.append(" ".join(rng.choice(words, n)))
        docs.append(i)
    # exact duplicates of the first five documents
    for j in range(5):
        docs.append(1000 + j)
        texts.append(texts[j])
    df = pd.DataFrame({"doc_id": np.array(docs, np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df).repartition(nblocks)
    got = tstage.textprep_decisions(ds).to_pandas()\
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(df)
    assert set(got["verdict"]) <= {"lang", "short", "lexical",
                                   "repetition", "duplicate", "keep"}
    # planted exact copies: whichever side passes gates, the copy of a
    # gate-passing original must be 'duplicate' (originals have the
    # smaller doc_id)
    byid = got.set_index("doc_id")["verdict"]
    for j in range(5):
        if byid[j] in ("keep", "duplicate"):
            assert byid[1000 + j] == "duplicate"
        else:
            assert byid[1000 + j] == byid[j]
    # deterministic across batching
    got1 = tstage.textprep_decisions(
        ray.data.from_pandas(df)).to_pandas()\
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got1)


@pytest.mark.parametrize("nblocks", [1, 5])
def test_substring_dup_exact(ray_session, nblocks):
    from unmixing_ray.stages import text as tstage
    # w=3 windows; doc 1 and 2 share "a b c d"; doc 3 repeats its own
    # window internally; doc 4 is all-unique; doc 5 too short
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4, 5], dtype=np.int64),
        "text": ["a b c d e",        # windows: abc bcd cde
                 "z a b c d",        # zab abc bcd
                 "p q r p q r p q",  # pqr qrp rpq pqr qrp rpq
                 "m n o",            # mno
                 "x y"]})
    ds = ray.data.from_pandas(docs).repartition(nblocks)
    got = tstage.substring_dup(ds, window=3).to_pandas()\
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [1, 2, 3, 4]      # doc 5 dropped
    assert got["n_windows"].tolist() == [3, 3, 6, 1]
    # doc1: abc+bcd dup (shared with doc2); doc2: abc+bcd; doc3: all 6
    # positions belong to within-doc repeated windows
    assert got["n_dup_windows"].tolist() == [2, 2, 6, 0]
    assert got["n_dup_distinct"].tolist() == [2, 2, 3, 0]


def test_substring_dup_matches_bruteforce(ray_session):
    from unmixing_ray.stages import text as tstage
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(2, 40)))
             for _ in range(60)]
    texts += texts[:5]  # planted exact dups
    ids = np.arange(len(texts), dtype=np.int64)
    w = 4
    from collections import Counter
    cnt = Counter()
    per_doc = {}
    for i, s in zip(ids, texts):
        toks = [t for t in s.split(" ") if t]
        wins = [" ".join(toks[j:j + w]) for j in range(len(toks) - w + 1)]
        if wins:
            per_doc[int(i)] = wins
            cnt.update(wins)
    exp = {d: (len(ws),
               sum(1 for x in ws if cnt[x] >= 2),
               len({x for x in ws if cnt[x] >= 2}))
           for d, ws in per_doc.items()}
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": ids, "text": texts})).repartition(7)
    got = tstage.substring_dup(ds, window=w).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        e = exp[int(r["doc_id"])]
        assert (r["n_windows"], r["n_dup_windows"],
                r["n_dup_distinct"]) == e


@pytest.mark.parametrize("nblocks,n_parts", [(1, 4), (7, 3), (7, 64)])
def test_pack_chunks_matches_bruteforce(ray_session, nblocks, n_parts):
    from unmixing_ray.stages import text as tstage
    rng = np.random.default_rng(13)
    texts = [" ".join("t%d" % v for v in rng.integers(0, 9, n))
             for n in rng.integers(0, 30, 80)]
    ids = rng.permutation(np.arange(1000, 1000 + len(texts)))\
        .astype(np.int64)
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    L = 16
    got = tstage.pack_chunks(
        ray.data.from_pandas(df).repartition(nblocks),
        seq_len=L, n_parts=n_parts).to_pandas()\
        .sort_values("doc_id").reset_index(drop=True)
    ref = df.sort_values("doc_id").reset_index(drop=True)
    n = ref["text"].map(lambda s: len([t for t in s.split(" ") if t]))\
        .to_numpy(np.int64)
    start = np.concatenate(([0], np.cumsum(n)[:-1]))
    assert (got["doc_id"].to_numpy() == ref["doc_id"].to_numpy()).all()
    assert (got["n_tokens"].to_numpy() == n).all()
    assert (got["tok_start"].to_numpy() == start).all()
    first = np.where(n > 0, start // L, -1)
    last = np.where(n > 0, (start + n - 1) // L, -1)
    assert (got["chunk_first"].to_numpy() == first).all()
    assert (got["chunk_last"].to_numpy() == last).all()
    assert (got["n_chunks"].to_numpy()
            == np.where(n > 0, last - first + 1, 0)).all()


def test_decontaminate_matches_bruteforce(ray_session):
    from unmixing_ray.stages import text as tstage
    rng = np.random.default_rng(5)
    vocab = [f"v{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 25)))
             for _ in range(50)]
    ids = np.arange(50, dtype=np.int64)
    docs = pd.DataFrame({"doc_id": ids, "text": texts})
    bench = docs[docs["doc_id"] % 5 == 2]
    w = 3

    def wins(s):
        toks = [t for t in s.split(" ") if t]
        return [" ".join(toks[j:j + w]) for j in range(len(toks) - w + 1)]

    bset = set()
    for s in bench["text"]:
        bset.update(wins(s))
    got = tstage.decontaminate(
        ray.data.from_pandas(docs).repartition(6),
        ray.data.from_pandas(bench.reset_index(drop=True)),
        window=w).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(docs)
    hit_any = 0
    for _, r in got.iterrows():
        ws = wins(docs.loc[docs["doc_id"] == r["doc_id"], "text"].iloc[0])
        hit = [x for x in ws if x in bset]
        assert r["n_windows"] == len(ws)
        assert r["n_contam"] == len(hit)
        assert r["n_contam_distinct"] == len(set(hit))
        hit_any += bool(hit)
    assert hit_any >= 10   # benchmark overlap is non-vacuous


def test_substring_dup_duplicate_docid_rows(ray_session):
    """Duplicate doc_id input rows must credit each distinct repeated
    window ONCE per doc (matching count(DISTINCT w) in the oracle)."""
    from unmixing_ray.stages import text as tstage
    docs = pd.DataFrame({
        "doc_id": np.array([7, 7, 8], dtype=np.int64),
        "text": ["a b c d", "a b c d", "a b c z"]})
    got = tstage.substring_dup(
        ray.data.from_pandas(docs).repartition(3), window=3)\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc 7: two physical rows x 2 windows each, both windows repeat
    assert got.loc[got["doc_id"] == 7, "n_windows"].iloc[0] == 4
    assert got.loc[got["doc_id"] == 7, "n_dup_windows"].iloc[0] == 4
    assert got.loc[got["doc_id"] == 7, "n_dup_distinct"].iloc[0] == 2
    # doc 8 shares only "a b c"
    assert got.loc[got["doc_id"] == 8, "n_dup_distinct"].iloc[0] == 1


def test_pack_chunks_empty(ray_session):
    from unmixing_ray.stages import text as tstage
    empty = ray.data.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype=object)}))
    got = tstage.pack_chunks(empty, seq_len=8)
    assert got.count() == 0
    # (to_pandas() on an empty Dataset drops columns — assert on the
    # Dataset schema, which is what downstream stages consume)
    assert got.schema().names == ["doc_id", "n_tokens", "tok_start",
                                  "chunk_first", "chunk_last", "n_chunks"]


def test_decontaminate_empty_bench(ray_session):
    from unmixing_ray.stages import text as tstage
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.array([1], dtype=np.int64),
        "text": ["a b c d e"]}))
    empty = ray.data.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype=object)}))
    got = tstage.decontaminate(docs, empty, window=2).to_pandas()
    assert got["n_contam"].tolist() == [0]
    assert got["n_windows"].tolist() == [4]


def test_running_total_partitioning_invariant(ray_session):
    """Per-key cumulative sums must be identical at any block layout
    (the per-group sort owns all ordering; nothing depends on block
    arrival order)."""
    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "t": rng.permutation(n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
        "v": np.round(rng.uniform(1, 100, n), 2)})
    outs = []
    for nb in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nb)
        got = relational.running_total(
            ds, "k", ["t", "id"], "v", scale=100).to_pandas()
        outs.append(got.sort_values(["k", "t", "id"])
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])
    # spot-check one key against a plain pandas replay
    k0 = df[df["k"] == 3].sort_values(["t", "id"])
    want = np.cumsum(np.rint(k0["v"].to_numpy() * 100).astype(np.int64))
    got0 = outs[0][outs[0]["k"] == 3]["running_c"].to_numpy()
    assert (got0 == want).all()


def test_grouped_moments_exact_vs_pandas(ray_session):
    rng = np.random.default_rng(12)
    n = 4000
    df = pd.DataFrame({
        "k": rng.choice(list("abc"), n),
        "x": rng.integers(1, 51, n).astype(np.float64),
        "y": np.round(rng.uniform(900, 105000, n), 2)})
    ds = ray.data.from_pandas(df).repartition(5)
    got = relational.grouped_moments(
        ds, "k", "x", "y", y_scale=100, y_div=100).to_pandas()\
        .sort_values("k").reset_index(drop=True)
    xi = np.rint(df["x"]).astype(np.int64)
    yi = (np.rint(df["y"] * 100).astype(np.int64) // 100)
    ref = pd.DataFrame({
        "k": df["k"], "n": 1, "sum_x": xi, "sum_y": yi,
        "sum_xx": xi * xi, "sum_yy": yi * yi, "sum_xy": xi * yi})\
        .groupby("k", as_index=False).sum().sort_values("k")\
        .reset_index(drop=True)
    for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"):
        assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c
    # the derived correlation is a pure function of the six integers
    for _, r in got.iterrows():
        cov = r.n * r.sum_xy - r.sum_x * r.sum_y
        vx = r.n * r.sum_xx - r.sum_x ** 2
        vy = r.n * r.sum_yy - r.sum_y ** 2
        corr = cov / math.sqrt(vx * vy)
        assert -1.0 <= corr <= 1.0


def test_grouped_quantile_cont_matches_numpy_linear(ray_session):
    """percentile_cont == numpy's method='linear' (both are the ANSI
    interpolated definition); the returned rational fraction must
    reproduce the interpolation exactly."""
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "k": rng.choice(list("xy"), 3001),
        "v": rng.normal(0, 10, 3001)})
    ds = ray.data.from_pandas(df).repartition(6)
    got = relational.grouped_quantile_cont(
        ds, "k", "v", qs=((1, 2), (9, 10), (99, 100)))
    for kv, g in df.groupby("k"):
        v = g["v"].to_numpy()
        for (qn, qd) in ((1, 2), (9, 10), (99, 100)):
            row = got[(got["k"] == kv) & (got["qn"] == qn)
                      & (got["qd"] == qd)].iloc[0]
            want = np.quantile(v, qn / qd, method="linear")
            assert abs(row["interp"] - want) < 1e-9, (kv, qn, qd)
            redo = row["lo"] + (row["frac_num"] / row["frac_den"]) \
                * (row["hi"] - row["lo"])
            assert redo == row["interp"]
            assert row["n"] == len(v)


def test_cm_sketch_bounds_and_partitioning_invariance(ray_session):
    """Count-Min estimates are one-sided (never undercount) with error
    ≤ e/w · N on the heavy keys, and the merged sketch is identical at
    any block layout (elementwise-sum mergeability)."""
    rng = np.random.default_rng(21)
    # zipf-ish: a few heavy tokens + a long tail
    vals = np.concatenate([
        np.repeat(["alpha", "beta", "gamma"], [3000, 1500, 700]),
        rng.choice([f"t{i}" for i in range(2000)], 4000)])
    rng.shuffle(vals)
    df = pd.DataFrame({"tok": vals})
    d, w = 4, 1 << 12
    sketches = []
    for nb in (1, 9):
        ds = ray.data.from_pandas(df).repartition(nb)
        sketches.append(relational.cm_sketch(ds, "tok", d=d, w=w))
    assert np.array_equal(sketches[0], sketches[1])
    truth = pd.Series(vals).value_counts()
    probe = ["alpha", "beta", "gamma", "t0", "t1"]
    est = relational.cm_query(sketches[0], probe)
    n = len(vals)
    eps = np.e / w
    for p, e_ in zip(probe, est):
        t = int(truth.get(p, 0))
        assert e_ >= t, p                      # one-sided
        assert e_ - t <= eps * n * 3, p        # loose 3x margin


def test_moving_window_matches_pandas_rolling(ray_session):
    rng = np.random.default_rng(14)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n).astype(np.int64),
        "t": rng.permutation(n).astype(np.int64),
        "v": np.round(rng.uniform(1, 500, n), 2)})
    ds = ray.data.from_pandas(df).repartition(6)
    got = relational.moving_window(ds, "k", ["t"], "v", k=4)\
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    ref = df.sort_values(["k", "t"]).copy()
    cents = np.rint(ref["v"].to_numpy() * 100).astype(np.int64)
    ref["c"] = cents
    roll = ref.groupby("k")["c"].rolling(4, min_periods=1).sum()\
        .reset_index(drop=True)
    cnt = ref.groupby("k")["c"].rolling(4, min_periods=1).count()\
        .reset_index(drop=True)
    assert (got["win_sum_c"].to_numpy()
            == roll.to_numpy().astype(np.int64)).all()
    assert (got["win_n"].to_numpy()
            == cnt.to_numpy().astype(np.int64)).all()


def test_grouped_rank_matches_pandas(ray_session):
    rng = np.random.default_rng(15)
    n = 4000
    df = pd.DataFrame({
        "k": rng.choice(list("ab"), n),
        "v": rng.integers(0, 12, n).astype(np.int64),   # heavy ties
        "id": np.arange(n, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(5)
    for desc in (True, False):
        got = relational.grouped_rank(ds, "k", "v", descending=desc,
                                      keep=["id"]).to_pandas()\
            .sort_values("id").reset_index(drop=True)
        ref = df.sort_values("id").reset_index(drop=True)
        meth = ref.groupby("k")["v"]
        rnk = meth.rank(method="min", ascending=not desc)
        drk = meth.rank(method="dense", ascending=not desc)
        assert (got["rnk"].to_numpy()
                == rnk.to_numpy().astype(np.int64)).all(), desc
        assert (got["drnk"].to_numpy()
                == drk.to_numpy().astype(np.int64)).all(), desc


@pytest.mark.parametrize("nblocks", [1, 5])
def test_bfs_levels_matches_reference_bfs(ray_session, nblocks):
    # Path 0-1-2-3-4 with a branch 2-10-11 and an unreachable island
    # 20-21; undirected (both arc directions listed).
    und = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 10), (10, 11), (20, 21)]
    arcs = und + [(b, a) for a, b in und]
    edges = ray.data.from_pandas(pd.DataFrame(
        {"s": [a for a, _ in arcs], "t": [b for _, b in arcs]}
    ).astype(np.int64)).repartition(nblocks)
    seeds = ray.data.from_items([{"v": 0}])
    got = relational.bfs_levels(edges, seeds, max_depth=3)\
        .to_pandas().sort_values("v").reset_index(drop=True)
    want = {0: 0, 1: 1, 2: 2, 3: 3, 10: 3}  # 4, 11 at depth 4; island never
    assert dict(zip(got["v"], got["level"])) == want


def test_bfs_levels_multi_seed_min_distance(ray_session):
    arcs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    arcs += [(b, a) for a, b in arcs]
    edges = ray.data.from_pandas(pd.DataFrame(
        {"s": [a for a, _ in arcs], "t": [b for _, b in arcs]}
    ).astype(np.int64))
    seeds = ray.data.from_items([{"v": 0}, {"v": 4}, {"v": 4}])
    got = relational.bfs_levels(edges, seeds, max_depth=8)\
        .to_pandas()
    assert dict(zip(got["v"], got["level"])) == \
        {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


@pytest.mark.parametrize("nblocks", [1, 5])
def test_sssp_rounds_matches_bellman_ford(ray_session, nblocks):
    # weighted digraph with a shorter 3-hop path beating a 1-hop arc
    arcs = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10),
            (3, 4, 2), (5, 6, 1)]   # 5-6 unreachable from 0
    edges = ray.data.from_pandas(pd.DataFrame(
        {"s": [a for a, _, _ in arcs], "t": [b for _, b, _ in arcs],
         "w": [w for _, _, w in arcs]}
    ).astype(np.int64)).repartition(nblocks)
    seeds = ray.data.from_items([{"v": 0}])

    def reference(k):
        INF = 1 << 60
        dist = {0: 0}
        for _ in range(k):
            nd = dict(dist)
            for a, b, w in arcs:
                if a in dist and dist[a] + w < nd.get(b, INF):
                    nd[b] = dist[a] + w
            dist = nd
        return dist

    for rounds in (1, 3, 6):
        got = relational.sssp_rounds(edges, seeds, rounds=rounds)\
            .to_pandas()
        assert dict(zip(got["v"], got["dist"])) == reference(rounds), \
            rounds


def test_sssp_rounds_multi_seed(ray_session):
    arcs = [(0, 1, 5), (2, 1, 1)]
    edges = ray.data.from_pandas(pd.DataFrame(
        {"s": [a for a, _, _ in arcs], "t": [b for _, b, _ in arcs],
         "w": [w for _, _, w in arcs]}).astype(np.int64))
    seeds = ray.data.from_items([{"v": 0}, {"v": 2}])
    got = relational.sssp_rounds(edges, seeds, rounds=2).to_pandas()
    assert dict(zip(got["v"], got["dist"])) == {0: 0, 2: 0, 1: 1}


def test_table_checksum_partitioning_invariant_and_sensitive(ray_session):
    import ray.data
    from unmixing_ray.stages.relational import (CHECKSUM_MOD,
                                                table_checksum)
    rows = [{"a": i, "b": "s%d" % (i % 7)} for i in range(300)]
    base = None
    for parts in (1, 9):
        ds = ray.data.from_items(rows).repartition(parts)
        got = table_checksum(ds, ["a", "b"])
        assert int(got["n_rows"].iloc[0]) == 300
        d = int(got["digest_sum"].iloc[0])
        assert 0 <= d < CHECKSUM_MOD
        if base is None:
            base = d
        else:
            assert d == base
    # single-row change flips the digest
    rows[17]["b"] = "tampered"
    got2 = table_checksum(ray.data.from_items(rows), ["a", "b"])
    assert int(got2["digest_sum"].iloc[0]) != base


def test_zonemap_prune_reads_fewer_files(ray_session, tmp_path):
    """The zone map must skip non-overlapping files and the pruned
    count must equal the unpruned one."""
    import ray.data
    from unmixing_ray.state.zonemap import (ntile_of_rank,
                                            pruned_range_count,
                                            write_sorted_zonemap)
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 10_000, 500)
    rows = [{"id": i, "v": int(v)} for i, v in enumerate(vals)]
    ds = ray.data.from_items(rows).repartition(5)
    out = str(tmp_path / "zm")
    zmap = write_sorted_zonemap(ds, "v", "id", out, n_files=8)
    assert len(zmap) == 8 and int(zmap["n"].sum()) == 500
    got = pruned_range_count(out, zmap, "v", 2000, 3000)
    want = int(((vals >= 2000) & (vals <= 3000)).sum())
    assert int(got["n_match"].iloc[0]) == want
    assert int(got["files_read"].iloc[0]) < 8
    assert int(got["rows_scanned"].iloc[0]) < 500
    # ntile split matches ANSI semantics on an uneven n
    f = ntile_of_rank(np.arange(1, 11), 10, 3)
    assert f.tolist() == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]


def test_corpus_mix_partitioning_invariant(ray_session):
    """corpus_mix: identical (doc_id, source, src_rank, kept) at any
    bucket count, and quotas follow the exact integer arithmetic."""
    import ray.data
    from unmixing_ray.stages import relational as rel
    ids = list(range(0, 400, 3)) + [10_000, 10_003]
    ds = ray.data.from_items([{"doc_id": i} for i in ids])
    outs = []
    for n_parts in (4, 64):
        out = rel.corpus_mix(ds, "doc_id", n_parts=n_parts)\
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    assert outs[0].equals(outs[1])
    out = outs[0]
    # per-source ranks are 0..n_s-1 in doc_id order
    for _s, g in out.groupby("source"):
        assert list(g.sort_values("doc_id")["src_rank"]) \
            == list(range(len(g)))
    # quota arithmetic: T = total*frac//1e6; quota_s = min(n_s, T*w//sum)
    total = len(out)
    T = total * 500_000 // 1_000_000
    w = dict(rel.MIX_SOURCES)
    wsum = sum(w.values())
    for s, g in out.groupby("source"):
        q = min(len(g), T * w[s] // wsum)
        assert int(g["kept"].sum()) == q
        kept_ids = set(g.loc[g["kept"] == 1, "doc_id"])
        first_q = set(g.sort_values("doc_id")["doc_id"].head(q))
        assert kept_ids == first_q


def test_corpus_mix_generic_weights(ray_session):
    """ADVICE r04: the tagger derives K md5-range buckets from K-1
    thresholds generically — 2-way and 4-way mixes work, every name is
    assignable, and mismatched weights/source_rates refuse loudly."""
    import ray.data
    from unmixing_ray.stages import relational as rel
    ids = list(range(0, 900, 2))
    ds = ray.data.from_items([{"doc_id": i} for i in ids])

    for weights, rates in [
        ((("a", 1), ("b", 1)), (0.5,)),
        ((("w", 40), ("x", 30), ("y", 20), ("z", 10)),
         (0.4, 0.7, 0.9)),
    ]:
        out = rel.corpus_mix(ds, "doc_id", weights=weights,
                             source_rates=rates).to_pandas()
        names = [w[0] for w in weights]
        got = set(out["source"])
        assert got <= set(names) and len(got) >= 2
        assert len(out) == len(ids)
        # quotas: exact integer arithmetic over the generic weights
        T = len(out) * 500_000 // 1_000_000
        wmap, wsum = dict(weights), sum(w[1] for w in weights)
        for s, g in out.groupby("source"):
            assert int(g["kept"].sum()) == \
                min(len(g), T * wmap[s] // wsum)

    with pytest.raises(ValueError, match="source_rates"):
        rel.corpus_mix(ds, "doc_id",
                       weights=(("a", 1), ("b", 1)),
                       source_rates=(0.3, 0.6))
    with pytest.raises(ValueError, match="ascending"):
        rel.corpus_mix(ds, "doc_id",
                       weights=(("a", 1), ("b", 1), ("c", 1)),
                       source_rates=(0.6, 0.3))


def test_chunk_spans_bruteforce(ray_session):
    """chunk_spans vs a per-doc Python reference: full coverage,
    overlap = seq_len - stride, short tails, empty docs emit nothing,
    and invalid stride refuses."""
    import ray.data
    from unmixing_ray.stages import text as tstage
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["a b c d e f g h i j",          # 10 tokens
                 "x",                            # 1
                 "",                             # 0 -> no chunks
                 " ".join("t%d" % i for i in range(25)),   # 25
                 "p  q   r",                     # 3 (multi-space)
                 " ".join("z" for _ in range(8))]})        # 8
    L, S = 8, 5
    out = tstage.chunk_spans(
        ray.data.from_pandas(docs).repartition(3),
        seq_len=L, stride=S).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    rows = []
    for _, r in docs.iterrows():
        n = len([t for t in r["text"].split(" ") if t])
        i = 0
        while i * S < n:
            e = min(i * S + L, n)
            rows.append((r["doc_id"], i, i * S, e, e - i * S))
            i += 1
    want = pd.DataFrame(rows, columns=[
        "doc_id", "chunk_id", "tok_start", "tok_end",
        "n_chunk_tokens"]).astype("int64") \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype("int64"), want)
    # every token of every doc is covered by >= 1 chunk
    for did, g in out.groupby("doc_id"):
        n = want.loc[want["doc_id"] == did, "tok_end"].max()
        covered = np.zeros(int(n), dtype=bool)
        for _, c in g.iterrows():
            covered[c["tok_start"]:c["tok_end"]] = True
        assert covered.all()
    with pytest.raises(ValueError, match="stride"):
        tstage.chunk_spans(ray.data.from_pandas(docs), seq_len=4,
                           stride=9)

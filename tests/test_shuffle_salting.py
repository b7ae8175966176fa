"""Skew salting: count pre-pass, salt plan, salted groupby equivalence."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.stages import shuffle as sh

pytestmark = pytest.mark.usefixtures("ray_session")


def _rows(counts):
    rows = []
    i = 0
    for cell, n in counts.items():
        for _ in range(n):
            rows.append({"cell": cell, "tile_id": "t%06d" % i,
                         "value": i})
            i += 1
    return rows


def test_cell_counts_and_plan():
    ds = ray.data.from_items(_rows({1: 5, 2: 100, 3: 7}))
    counts = sh.cell_counts(ds)
    assert counts == {1: 5, 2: 100, 3: 7}
    plan = sh.plan_salts(counts, hot_threshold=10)
    assert set(plan) == {2}
    assert plan[2] == 10


def test_salted_groupby_same_results_per_key():
    """Per-row-independent fn: salted union of sub-groups must equal the
    unsalted group results per key."""
    counts = {1: 4, 2: 60, 3: 8}
    ds = ray.data.from_items(_rows(counts))

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cell": g["cell"].iloc[:1],
            "n": [len(g)],
            "value_sum": [int(g["value"].sum())],
        })

    unsalted = sh.salted_groupby(ds, "cell", fn, hot_threshold=10**9, batch_format="pandas")\
        .to_pandas().groupby("cell", as_index=False).sum()
    salted = sh.salted_groupby(ds, "cell", fn, hot_threshold=16, batch_format="pandas")\
        .to_pandas().groupby("cell", as_index=False).sum()
    u = unsalted.sort_values("cell").reset_index(drop=True)
    s = salted.sort_values("cell").reset_index(drop=True)
    assert u["n"].tolist() == s["n"].tolist()
    assert u["value_sum"].tolist() == s["value_sum"].tolist()
    # hot key was actually split into multiple sub-groups
    raw = sh.salted_groupby(ds, "cell", fn, hot_threshold=16, batch_format="pandas").to_pandas()
    assert (raw["cell"] == 2).sum() > 1


def test_add_salt_deterministic():
    plan = {2: 4}
    fn = sh.make_add_salt(plan)
    import pyarrow as pa
    batch = pa.table({"cell": pa.array([1, 2, 2]),
                      "tile_id": pa.array(["a", "b", "c"])})
    out1 = fn(batch)
    out2 = fn(batch)
    assert out1["salt"].to_pylist() == out2["salt"].to_pylist()
    assert out1["salt"][0].as_py() == 0   # cold key unsalted


def test_skewed_corpus_salted_equals_unsalted(tmp_path_factory):
    """Planted hot cells (stacked images): the salted plan must actually
    salt them AND produce the same per-cell result as the plain groupby."""
    import pyarrow as pa
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages import decode as dstage
    out = tmp_path_factory.mktemp("skew")
    corpus = synth.generate_skewed_corpus(str(out), n_images=60, seed=7)
    ds = images.read_images(corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=16)\
        .select_columns(["cell", "tile_id"])

    counts = sh.cell_counts(tiles)
    plan = sh.plan_salts(counts, hot_threshold=16)
    assert plan, "skewed corpus must produce at least one hot cell"
    assert max(counts.values()) >= 30  # the stacked location

    def cnt(g: pa.Table) -> pa.Table:
        return pa.table({
            "cell": pa.array([g["cell"][0].as_py()], pa.uint64()),
            "n": pa.array([g.num_rows], pa.int64())})

    salted = sh.salted_groupby(tiles, "cell", cnt, hot_threshold=16)\
        .to_pandas().groupby("cell", as_index=False)["n"].sum()
    plain = tiles.groupby("cell").map_groups(
        cnt, batch_format="pyarrow").to_pandas()
    merged = salted.merge(plain, on="cell", suffixes=("_s", "_p"))
    assert len(merged) == len(plain) == len(salted)
    assert (merged["n_s"] == merged["n_p"]).all()


def test_hot_key_audit_and_should_salt(ray_session):
    """VERDICT r04 item 6: the exchange-free hot-key audit finds the
    concentrated keys with tight lower bounds, and the cost model salts
    only above alpha worker shares (regime-dependent alpha)."""
    import numpy as np
    import pandas as pd
    import ray.data
    from unmixing_ray.stages import shuffle as sh

    # 1 hot key with a quarter of the rows (4 worker shares at 16
    # cpus), 1500 cold keys with 4 rows each
    hotk = np.full(2000, 7, dtype=np.int64)
    cold = np.repeat(np.arange(100, 1600, dtype=np.int64), 4)
    df = pd.DataFrame({"cell": np.concatenate([hotk, cold])}).sample(
        frac=1.0, random_state=0).reset_index(drop=True)
    ds = ray.data.from_pandas(np.array_split(df, 16))
    hot_counts, total = sh.hot_key_audit(ds, "cell")
    assert total == len(df)
    assert set(hot_counts) == {7}
    assert 1800 <= hot_counts[7] <= 2000   # tight lower bound

    # 4 worker shares on one key: salts at alpha=2 (saturated regime),
    # not at alpha=6 (quiet regime) with 16 cpus
    assert sh.should_salt(hot_counts, n_cpus=16, alpha=2.0,
                          total_rows=total) == [7]
    assert sh.should_salt(hot_counts, n_cpus=16, alpha=6.0,
                          total_rows=total) == []
    # regime auto-derivation from an explicit bandwidth reading
    assert sh.should_salt(hot_counts, n_cpus=16, bandwidth_gb_s=5.0,
                          total_rows=total) == [7]
    assert sh.should_salt(hot_counts, n_cpus=16, bandwidth_gb_s=40.0,
                          total_rows=total) == []
    # the probe itself returns something physical
    bw = sh.memory_bandwidth_probe(mb=32)
    assert 0.1 < bw < 1000.0

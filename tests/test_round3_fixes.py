"""Round-3 regression pins for the round-2 advisory findings:

- candidate pool keys must not wrap the cell level bits (levels >= 16
  collided coarse cells under the old (cell >> 4) * 64 + role packing);
- roles >= 64 must raise loudly instead of colliding into the next cell;
- split_hot_tiles must not drop remainder rows/cols when the tile edge
  is not divisible by the sub-block count;
- ppi_global must handle batches mixing tiles of different band counts
  (skewers and running extremes are bucketed per band count).
"""

import numpy as np
import pytest

from unmixing_ray import cellindex
from unmixing_ray.stages import unmix as u

pytestmark = pytest.mark.usefixtures("ray_session")


def _part(cells, roles, values, tiles, pixels, spectra, p):
    return {
        "cell": np.asarray(cells, dtype=np.uint64),
        "role": np.asarray(roles, dtype=np.int16),
        "value": np.asarray(values, dtype=np.float64),
        "tile_id": np.asarray(tiles),
        "pixel": np.asarray(pixels, dtype=np.int32),
        "spectra": np.asarray(spectra, dtype=np.float64),
        "p": p,
    }


def test_pool_key_keeps_level_bits_distinct():
    """Same morton bits at level 20 vs level 4 previously collided: the
    level field's bit 4 shifted past bit 63 under the old packing."""
    c20 = cellindex.cell_from_ixiy(np.uint64(5), np.uint64(9), 20)
    c4 = cellindex.cell_from_ixiy(np.uint64(5), np.uint64(9), 4)
    assert int(c20) != int(c4)
    red = u.reduce_candidates([_part(
        [c20, c4], [0, 0], [1.0, 2.0], ["a", "b"], [0, 1],
        [[1.0, 2.0], [3.0, 4.0]], 2)])
    assert len(red["key"]) == 2
    # round-trip: pool_to_part must restore level 20 and level 4 cells
    part = u.pool_to_part(red)
    levels = sorted(int(lv) for lv in
                    cellindex.cell_to_ixiy(part["cell"])[2])
    assert levels == [4, 20]


def test_pool_key_role_guard():
    with pytest.raises(ValueError, match="role"):
        u.reduce_candidates([_part(
            [1], [64], [1.0], ["a"], [0], [[1.0, 2.0]], 2)])


def test_pool_key_reduce_still_associative_at_level20():
    rng = np.random.default_rng(11)
    n = 40
    cells = cellindex.cell_from_ixiy(
        rng.integers(0, 1000, n).astype(np.uint64),
        rng.integers(0, 1000, n).astype(np.uint64), 20)
    parts = []
    for lo in range(0, n, 10):
        sel = slice(lo, lo + 10)
        parts.append(_part(
            cells[sel], np.zeros(10), rng.normal(size=10),
            ["t%03d" % i for i in range(lo, lo + 10)],
            rng.integers(0, 99, 10), rng.normal(size=(10, 3)), 3))
    whole = u.reduce_candidates(parts)
    merged = u.merge_side_pools([u.reduce_candidates([p]) for p in parts])
    for k in ("key", "value", "pixel", "tile_id"):
        assert np.array_equal(whole[k], merged[k]), k


def test_split_hot_tiles_remainder_rows_preserved():
    import ray.data
    from unmixing_ray.stages import composite as cstage
    rng = np.random.default_rng(6)
    a = rng.integers(0, 100, (2, 5, 5)).astype(np.float64)
    ds = ray.data.from_items([{
        "cell": 9, "date": 0, "bands": 2, "h": 5, "w": 5,
        "pixels": a.ravel().tolist()}])
    out = cstage.split_hot_tiles(ds, hot_cells=[9], sub=2).to_pandas()
    # 5 = 2 + 3: the last sub-block absorbs the remainder
    assert sorted(out["h"].tolist()) == [2, 2, 3, 3]
    assert sorted(out["w"].tolist()) == [2, 2, 3, 3]
    total = sum(
        np.frombuffer(row["pixels"], dtype=np.float64).sum()
        for _, row in out.iterrows())
    assert np.isclose(total, a.sum())


def test_composite_auto_salt_parity():
    """VERDICT r02 item 9: composite_by_cell(hot_threshold=...) salts hot
    cells internally (count pre-pass + spatial sub-split + reassembly)
    and produces exactly the unsalted plan's rows."""
    import ray.data
    from unmixing_ray.stages import composite as cstage
    rng = np.random.default_rng(17)
    rows = []
    for cell, n_dates in ((100, 30), (101, 3), (102, 5)):
        for d in range(n_dates):
            a = rng.integers(0, 2000, (2, 8, 8)).astype(np.int16)
            a[0, 0, d % 8] = -9999
            rows.append({"cell": cell, "date": d, "tile_id":
                         "c%d_d%d" % (cell, d), "bands": 2, "h": 8,
                         "w": 8, "pixels": a.tobytes()})
    reducers = ("median", "max")
    plain = cstage.composite_by_cell(
        ray.data.from_items(rows), reducers, normalize=None)\
        .to_pandas().sort_values("cell").reset_index(drop=True)
    salted = cstage.composite_by_cell(
        ray.data.from_items(rows), reducers, normalize=None,
        hot_threshold=10, sub=3)\
        .to_pandas().sort_values("cell").reset_index(drop=True)
    assert plain["cell"].tolist() == salted["cell"].tolist()
    assert plain["n_dates"].tolist() == salted["n_dates"].tolist()
    for i in range(len(plain)):
        assert plain.iloc[i]["h"] == salted.iloc[i]["h"]
        assert plain.iloc[i]["w"] == salted.iloc[i]["w"]
        assert np.array_equal(
            np.asarray(plain.iloc[i]["pixels"], dtype=np.float32),
            np.asarray(salted.iloc[i]["pixels"], dtype=np.float32)), i


def test_ppi_global_mixed_band_counts():
    import ray.data
    rng = np.random.default_rng(8)
    rows = []
    for i, p in enumerate((4, 4, 6, 6)):
        arr = rng.normal(size=(p, 1 if p == 4 else 4,
                               1 if p == 4 else 4)).astype(np.float32)
        rows.append({"tile_id": "t%02d" % i, "bands": p,
                     "h": arr.shape[1], "w": arr.shape[2],
                     "mnf": arr.tobytes()})
    ems = u.ppi_global(ray.data.from_items(rows), q=2, num_skewers=64)
    assert len(ems) == 2
    for s in ems:
        assert len(s) in (4, 6)


def test_apply_mnf_truncation():
    """n_components ships only the first k MNF components (bands column
    rewritten), values bit-matching the full projection's first k rows'
    float32 view; pixels must be dropped alongside."""
    import ray.data
    from unmixing_ray.stages import mnf as mnf_stage
    from unmixing_ray.stages.decode import binary_views
    rng = np.random.default_rng(9)
    a = rng.integers(0, 3000, (6, 4, 4)).astype(np.int16)
    W = np.linalg.qr(rng.normal(size=(6, 6)))[0]
    ds = ray.data.from_items([{
        "tile_id": "t0", "bands": 6, "h": 4, "w": 4,
        "pixels": a.tobytes()}])
    full = ds.map_batches(mnf_stage.make_apply_mnf(W),
                          batch_format="pyarrow").take_all()[0]
    trunc = ds.map_batches(
        mnf_stage.make_apply_mnf(W, drop=("pixels",), n_components=2),
        batch_format="pyarrow").take_all()[0]
    assert trunc["bands"] == 2
    assert "pixels" not in trunc
    f = np.frombuffer(full["mnf"], dtype=np.float32).reshape(6, 16)
    t = np.frombuffer(trunc["mnf"], dtype=np.float32).reshape(2, 16)
    assert np.allclose(f[:2], t, rtol=0, atol=1e-4)
    with pytest.raises(ValueError, match="pixels"):
        mnf_stage.make_apply_mnf(W, n_components=2)


def test_asof_join_semantics():
    """Hand-built fixture: ties take the max right ts <= left ts; lefts
    with no prior right are dropped; users are independent."""
    import pandas as pd
    import ray.data
    from unmixing_ray.stages import events as ev
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i, (u, typ, sec) in enumerate([
            (1, "click", 0), (1, "click", 10), (1, "purchase", 10),
            (1, "purchase", 5), (2, "purchase", 3), (2, "click", 4),
            (3, "click", 1), (3, "purchase", 2)]):
        rows.append({"user_id": u, "event_id": i, "event_type": typ,
                     "ts": base + pd.Timedelta(seconds=sec)})
    out = ev.asof_join(ray.data.from_items(rows)).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    # user 1: purchase@10 matches click@10 (<=, tie at same instant);
    # purchase@5 matches click@0; user 2: purchase@3 has no prior click
    # (dropped); user 3: purchase@2 matches click@1
    assert out["event_id"].tolist() == [2, 3, 7]
    assert out["lag_us"].tolist() == [0, 5_000_000, 1_000_000]

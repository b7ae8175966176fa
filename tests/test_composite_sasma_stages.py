"""Composite-by-cell, LEDAPS two-pass, hot-tile splitting, SASMA pipeline."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.constants import NODATA
from unmixing_ray.kernels import composite as ck
from unmixing_ray.stages import composite as cstage

pytestmark = pytest.mark.usefixtures("ray_session")


def _tile_rows(cell, dates, arr_fn):
    rows = []
    for d in dates:
        a = arr_fn(d)
        rows.append({
            "cell": cell, "date": d, "bands": a.shape[0],
            "h": a.shape[1], "w": a.shape[2],
            "pixels": a.astype(np.float64).ravel().tolist(),
            "tile_id": "t%d_%d" % (cell, d), "image_id": "i%d" % d,
            "row_off": 0, "col_off": 0,
        })
    return rows


def test_composite_by_cell_matches_kernel():
    rng = np.random.default_rng(55)
    arrs = {d: rng.integers(0, 100, (2, 4, 4)).astype(np.float64)
            for d in range(3)}
    arrs[1][:, 0, 0] = NODATA
    rows = _tile_rows(7, [0, 1, 2], lambda d: arrs[d])
    ds = ray.data.from_items(rows)
    out = cstage.composite_by_cell(
        ds, ("max*", "median"), normalize=None).to_pandas()
    assert len(out) == 1
    got = np.asarray(out.iloc[0]["pixels"]).reshape(2, 4, 4)
    want = ck.composite3(("max*", "median"), *[arrs[d] for d in range(3)],
                         normalize=None)
    assert np.allclose(got, want.astype(np.float32))


def test_composite_by_cell_auto_matches_plain():
    """hot_threshold="auto" (VERDICT r04 item 6): the cost-model path
    (materialize + exchange-free hot-key audit + regime-aware
    should_salt) produces rows identical to the plain plan, whether or
    not the decision engages the split."""
    rng = np.random.default_rng(77)
    rows = []

    def bin_rows(cell, dates):
        out = []
        for d in dates:
            a = rng.integers(0, 100, (2, 4, 4)).astype(np.int16)
            out.append({
                "cell": cell, "date": d, "bands": 2, "h": 4, "w": 4,
                "pixels": a.tobytes(),
                "tile_id": "t%d_%d" % (cell, d),
                "image_id": "i%d" % d, "row_off": 0, "col_off": 0})
        return out

    # one hot cell with 40 dates (dominates), a few cold cells
    rows += bin_rows(5, range(40))
    for c in (11, 12, 13):
        rows += bin_rows(c, [0, 1])
    ds = ray.data.from_items(rows)
    plain = cstage.composite_by_cell(
        ds, ("max*", "median"), normalize=None).to_pandas()
    auto = cstage.composite_by_cell(
        ds, ("max*", "median"), normalize=None,
        hot_threshold="auto").to_pandas()
    plain = plain.sort_values("cell").reset_index(drop=True)
    auto = auto.sort_values("cell").reset_index(drop=True)
    assert (plain["cell"].to_numpy() == auto["cell"].to_numpy()).all()
    for i in range(len(plain)):
        assert np.allclose(np.asarray(plain.iloc[i]["pixels"]),
                           np.asarray(auto.iloc[i]["pixels"]))
    # forced-split equivalence of the same input (hot threshold tiny)
    forced = cstage.composite_by_cell(
        ds, ("max*", "median"), normalize=None,
        hot_threshold=4).to_pandas().sort_values("cell")\
        .reset_index(drop=True)
    for i in range(len(plain)):
        assert np.allclose(np.asarray(plain.iloc[i]["pixels"]),
                           np.asarray(forced.iloc[i]["pixels"]))


def test_qa_mode_two_pass():
    rows = []
    for i in range(4):
        qa = np.full(16, 20, dtype=np.uint8)
        if i == 0:
            qa[:3] = 99
        rows.append({"tile_id": "t%d" % i,
                     "qa": qa.tolist(),
                     "bands": 1, "h": 4, "w": 4,
                     "pixels": np.ones(16, dtype=np.int16).tolist()})
    ds = ray.data.from_items(rows)
    mode = cstage.qa_mode_global(ds)
    assert mode == 20
    masked = ds.map_batches(cstage.make_ledaps_apply(mode),
                            batch_format="pyarrow").to_pandas()
    masked = masked.set_index("tile_id")
    a0 = np.asarray(masked.loc["t0", "pixels"]).reshape(1, 4, 4)
    assert (a0.ravel()[:3] == NODATA).all()
    assert (a0.ravel()[3:] == 1).all()


def test_split_hot_tiles_preserves_pixels():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 100, (2, 4, 4)).astype(np.float64)
    rows = _tile_rows(3, [0], lambda d: a) + _tile_rows(9, [0], lambda d: a)
    ds = ray.data.from_items(rows)
    out = cstage.split_hot_tiles(ds, hot_cells=[9], sub=2).to_pandas()
    assert len(out) == 1 + 4
    cold = out[out["cell"] == 3]
    assert len(cold) == 1 and cold.iloc[0]["sub_id"] == 0
    hot = out[out["cell"] == 9].sort_values("sub_id")
    assert hot["h"].tolist() == [2, 2, 2, 2]
    # payloads travel as binary in the input view's dtype (float64 here:
    # the test rows were built from python-list tiles)
    top_left = np.frombuffer(hot.iloc[0]["pixels"],
                             dtype=np.float64).reshape(2, 2, 2)
    assert np.array_equal(top_left, a[:, :2, :2])


def test_sasma_pipeline(small_corpus):
    from unmixing_ray.pipelines import flagship, sasma
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import mnf as mnf_stage
    from unmixing_ray.stages import unmix as unmix_stage
    tiles = flagship.build_tiles(small_corpus, None, tile=synth.TILE,
                                 cell_level=synth.CELL_LEVEL,
                                 checkpoint=False)
    W, _ = mnf_stage.fit_mnf(tiles)
    tiles_mnf = tiles.map_batches(mnf_stage.make_apply_mnf(W),
                                  batch_format="pyarrow", batch_size=64)
    ems = unmix_stage.induce_endmembers_nfindr(tiles_mnf, q=3)
    out = sasma.run_sasma(tiles_mnf, ems, q=3, n_dims=2,
                          window_size=7).to_pandas()
    assert len(out) == 40 * 4
    a = np.asarray(out.iloc[0]["abundance"]).reshape(3, -1)
    valid = a[0] != NODATA
    sums = a[:, valid].sum(axis=0)
    assert np.allclose(sums, 1.0, atol=1e-5)


def test_fit_cart_bounded_and_batching_invariant(small_corpus):
    """VERDICT item 4 'Done' pin: the distributed CART fit collects a
    BOUNDED pool (per-tile cap) and produces the identical tree at
    different batch sizes (per-tile candidate selection + sorted-stride
    subsample are functions of tile content only)."""
    import numpy as np
    from unmixing_ray.pipelines import flagship, sasma
    from unmixing_ray.sources import synth
    tiles = flagship.build_tiles(small_corpus, None, tile=synth.TILE,
                                 cell_level=synth.CELL_LEVEL,
                                 checkpoint=False)
    U = np.asarray([[300, 550, 450, 4200, 2400, 1100],
                    [2600, 2900, 3200, 3600, 4100, 3900],
                    [700, 900, 800, 500, 300, 200]], dtype=np.float64)
    t1 = sasma.fit_cart_distributed(
        tiles.map_batches(lambda b: b, batch_format="pyarrow",
                          batch_size=8), U, per_tile_cap=16,
        max_samples=500)
    t2 = sasma.fit_cart_distributed(
        tiles.map_batches(lambda b: b, batch_format="pyarrow",
                          batch_size=64), U, per_tile_cap=16,
        max_samples=500)
    a1, a2 = t1.to_arrays(), t2.to_arrays()
    assert set(a1) == set(a2)
    for k in a1:
        assert np.array_equal(np.asarray(a1[k]), np.asarray(a2[k])), k


def test_fit_cart_driver_pool_globally_bounded(small_corpus):
    """Round-3 pin (VERDICT r02 item 2): the driver never HOLDS more
    than ~2 * pool_cap candidate rows regardless of tile count (the
    streaming smallest-hash merge), and the tree is still identical
    across batch sizes when the pool overflows its cap."""
    import numpy as np
    from unmixing_ray.pipelines import flagship, sasma
    from unmixing_ray.sources import synth
    tiles = flagship.build_tiles(small_corpus, None, tile=synth.TILE,
                                 cell_level=synth.CELL_LEVEL,
                                 checkpoint=False)
    U = np.asarray([[300, 550, 450, 4200, 2400, 1100],
                    [2600, 2900, 3200, 3600, 4100, 3900],
                    [700, 900, 800, 500, 300, 200]], dtype=np.float64)
    # max_samples=20 -> pool_cap=80, far below the ~640 candidates the
    # corpus yields at per_tile_cap=16, so the cap is exercised
    t1, s1 = sasma.fit_cart_distributed(
        tiles.map_batches(lambda b: b, batch_format="pyarrow",
                          batch_size=8), U, per_tile_cap=16,
        max_samples=20, return_stats=True)
    t2, s2 = sasma.fit_cart_distributed(
        tiles.map_batches(lambda b: b, batch_format="pyarrow",
                          batch_size=64), U, per_tile_cap=16,
        max_samples=20, return_stats=True)
    for s in (s1, s2):
        assert s["held_max"] <= 2 * s["pool_cap"] + 1
        assert s["fit_rows"] <= 20
    a1, a2 = t1.to_arrays(), t2.to_arrays()
    for k in a1:
        assert np.array_equal(np.asarray(a1[k]), np.asarray(a2[k])), k

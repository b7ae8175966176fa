"""intersect_tiles, forward-model validation, viz aggregates, KML, CLI."""

import subprocess
import sys

import numpy as np
import pytest

import ray.data

from unmixing_ray import viz
from unmixing_ray.constants import NODATA
from unmixing_ray.stages import align

pytestmark = pytest.mark.usefixtures("ray_session")


def _tile_row(cell, tile_id, arr, gt, side_cols=True):
    return {
        "cell": cell, "tile_id": tile_id, "bands": arr.shape[0],
        "h": arr.shape[1], "w": arr.shape[2],
        "pixels": arr.astype(np.float32).ravel().tolist(),
        "gt": list(gt),
    }


def test_intersect_tiles_same_grid():
    gt = (1000.0, 30.0, 0.0, 2000.0, 0.0, -30.0)
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 100, (2, 4, 4)).astype(np.float64)
    src = rng.integers(0, 100, (2, 4, 4)).astype(np.float64)
    ref_ds = ray.data.from_items([_tile_row(5, "r0", ref, gt)])
    src_ds = ray.data.from_items([_tile_row(5, "s0", src, gt)])
    out = align.intersect_tiles(ref_ds, src_ds).to_pandas()
    assert len(out) == 1
    got = np.asarray(out.iloc[0]["pixels"]).reshape(2, 4, 4)
    assert np.array_equal(got, src.astype(np.float32))


def test_intersect_tiles_offset_grid():
    gt_ref = (1000.0, 30.0, 0.0, 2000.0, 0.0, -30.0)
    gt_src = (1030.0, 30.0, 0.0, 1970.0, 0.0, -30.0)  # 1 px SE shift
    src = np.arange(16, dtype=np.float64).reshape(1, 4, 4)
    ref = np.zeros((1, 4, 4))
    ref_ds = ray.data.from_items([_tile_row(5, "r0", ref, gt_ref)])
    src_ds = ray.data.from_items([_tile_row(5, "s0", src, gt_src)])
    out = align.intersect_tiles(ref_ds, src_ds).to_pandas()
    got = np.asarray(out.iloc[0]["pixels"]).reshape(1, 4, 4)
    # reference pixel (1,1) center = src pixel (0,0)
    assert got[0, 1, 1] == 0.0
    assert got[0, 3, 3] == src[0, 2, 2]
    # out-of-src area filled with NoData
    assert got[0, 0, 0] == NODATA


def test_forward_model_validation_perfect_recovery():
    gt = (0.0, 30.0, 0.0, 0.0, 0.0, -30.0)
    U = np.array([[100.0, 0.0, 0.0], [0.0, 100.0, 0.0],
                  [0.0, 0.0, 100.0]])
    rng = np.random.default_rng(4)
    ab = rng.dirichlet([1, 1, 1], size=64)        # (64, 3)
    arr = (ab @ U).T.reshape(3, 8, 8)
    ds = ray.data.from_items([_tile_row(1, "t0", arr, gt)])
    res = align.validate_forward_model(
        ds, {"t0": ab.T}, U, sample_rate=0.5, as_pct=True)
    assert res is not None and res < 0.1   # exact forward model -> ~0


def test_histogram_and_cdf(small_corpus):
    from unmixing_ray.pipelines import flagship
    from unmixing_ray.sources import synth
    tiles = flagship.build_tiles(small_corpus, None, tile=synth.TILE,
                                 cell_level=synth.CELL_LEVEL,
                                 clean=False, checkpoint=False)
    edges, counts = viz.histogram(tiles, band=0, bins=16)
    assert counts.sum() > 0
    _, cdf = viz.cumulative_freq(tiles, band=0, bins=16)
    assert cdf[-1] == pytest.approx(1.0)
    assert (np.diff(cdf) >= 0).all()


def test_eigenvalue_scree_and_dynamic_range(small_corpus):
    from unmixing_ray.pipelines import flagship
    from unmixing_ray.sources import synth
    tiles = flagship.build_tiles(small_corpus, None, tile=synth.TILE,
                                 cell_level=synth.CELL_LEVEL,
                                 clean=False, checkpoint=False)
    evals = viz.eigenvalue_scree(tiles)
    assert len(evals) == 6
    assert (np.diff(evals) <= 1e-6).all()  # descending
    stats = viz.report_raster_dynamic_range(tiles)
    assert stats["mean_dynamic_range"] > 0
    assert (stats["max"] >= stats["min"]).all()


def test_feature_space_selection_and_kml(small_corpus):
    from unmixing_ray.pipelines import flagship
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import mnf as mnf_stage
    tiles = flagship.build_tiles(small_corpus, None, tile=synth.TILE,
                                 cell_level=synth.CELL_LEVEL,
                                 clean=False, checkpoint=False)
    W, _ = mnf_stage.fit_mnf(tiles)
    tiles_mnf = tiles.map_batches(mnf_stage.make_apply_mnf(W),
                                  batch_format="pyarrow")
    coords = viz.feature_space_selection(
        tiles_mnf, box=(-1e9, 1e9, -1e9, 1e9), max_points=10)
    assert len(coords) == 10
    kml = viz.selection_to_kml(coords)
    # deterministic golden: same selection twice -> identical bytes
    coords2 = viz.feature_space_selection(
        tiles_mnf, box=(-1e9, 1e9, -1e9, 1e9), max_points=10)
    assert viz.selection_to_kml(coords2) == kml
    assert kml.count("<Placemark>") == 11  # 10 points + extent polygon
    assert viz.endmember_idx_to_kml(coords[:3]).count("<Placemark>") == 3


def test_cli_generate_and_flagship(tmp_path):
    corpus = str(tmp_path / "corpus")
    out = subprocess.run(
        [sys.executable, "-m", "unmixing_ray.cli", "generate",
         "--out", corpus, "--n-images", "16"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    run = subprocess.run(
        [sys.executable, "-m", "unmixing_ray.cli", "flagship",
         "--corpus", corpus, "--out", str(tmp_path / "out"),
         "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo")
    assert run.returncode == 0, run.stderr[-2000:]
    import json
    res = json.loads(run.stdout.strip().splitlines()[-1])
    assert res["n_partitions"] > 0

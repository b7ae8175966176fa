"""Flagship pipeline end-to-end + checkpoint/resume + parallelism
invariance (the Ray analogue of the reference's 1-proc==2-proc pin)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from unmixing_ray.pipelines import flagship
from unmixing_ray.sources import synth
from unmixing_ray.state import manifest as ckpt

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def flagship_result(small_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("flagship"))
    res = flagship.run_flagship(
        small_corpus, out, tile=synth.TILE, cell_level=synth.CELL_LEVEL,
        q=3, k_knn=2)
    return small_corpus, out, res


def test_flagship_outputs(flagship_result):
    corpus, out, res = flagship_result
    ab = ckpt.read_output(res["abundances_dir"])
    assert ab is not None
    assert ab.num_rows == 40 * 4
    q = ab["q"][0].as_py()
    assert q == 3
    # abundances: non-negative, sum-to-one per pixel
    for i in range(0, ab.num_rows, 37):
        a = np.frombuffer(ab["abundance"][i].as_py(),
                          dtype=np.float32).astype(np.float64)
        h, w = ab["h"][i].as_py(), ab["w"][i].as_py()
        cube = a.reshape(q, h * w)
        assert (cube >= -1e-9).all()
        assert np.allclose(cube.sum(axis=0), 1.0, atol=1e-6)
    # caption survives to the final output (north-star invariant)
    imgs = synth.images_table(corpus, columns=["image_id", "caption"])
    capmap = dict(zip(imgs["image_id"].to_pylist(),
                      imgs["caption"].to_pylist()))
    for i in range(0, ab.num_rows, 13):
        assert ab["caption"][i].as_py() == \
            capmap[ab["image_id"][i].as_py()]


def test_flagship_lineage_manifest(flagship_result):
    _corpus, _out, res = flagship_result
    rows = ckpt.read_manifest(res["abundances_dir"])
    assert len(rows) >= 1
    assert sum(r["rows"] for r in rows) == 40 * 4
    for r in rows:
        assert r["stage"] == "abundances"
        assert r["bytes"] > 0 and r["wall_ms"] >= 0


def test_flagship_join_rows(flagship_result):
    corpus, _out, res = flagship_result
    import duckdb
    got = duckdb.sql(
        f"SELECT kind, count(*) AS n FROM "
        f"read_parquet('{res['join_dir']}/part-*/*.parquet') "
        f"GROUP BY kind ORDER BY kind").df()
    kinds = dict(zip(got["kind"], got["n"]))
    assert kinds.get("knn") == 40 * 4 * 2
    assert kinds.get("pip", 0) > 0
    # round-3 pin: join rows are written partitioned from inside the
    # write pass with their own manifest — nothing is concatenated on
    # the driver, and the join output is checkpoint-resumable
    jrows = ckpt.read_manifest(res["join_dir"])
    assert len(jrows) >= 1
    assert all(r["stage"] == "join_rows" for r in jrows)
    ab_parts = ckpt.completed_partitions(res["abundances_dir"])
    join_parts = ckpt.completed_partitions(res["join_dir"])
    assert ab_parts <= join_parts


def test_resume_skips_completed(small_corpus, tmp_path):
    out = str(tmp_path / "resume")
    tiles = flagship.build_tiles(small_corpus, out, tile=synth.TILE,
                                 cell_level=synth.CELL_LEVEL)
    n1 = tiles.count()
    done_before = ckpt.completed_partitions(os.path.join(out, "tiles"))
    assert len(done_before) > 0
    # second run: everything already complete -> no rewrites
    import glob
    mtimes = {}
    tdir = os.path.join(out, "tiles")
    for p in glob.glob(os.path.join(tdir, "part-*", "*.parquet")):
        mtimes[p] = os.path.getmtime(p)
    tiles2 = flagship.build_tiles(small_corpus, out, tile=synth.TILE,
                                  cell_level=synth.CELL_LEVEL)
    assert tiles2.count() == n1
    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m


def test_fused_induce_matches_recompute(flagship_result):
    """The side-channel candidate pool (fused into the write pass) and
    the standalone recompute pass (used on resumed runs) must induce
    bit-identical endmembers."""
    import ray.data
    from unmixing_ray.stages import unmix as unmix_stage
    _corpus, out, res = flagship_result
    tiles = ray.data.read_parquet(os.path.join(out, "tiles"),
                                  file_extensions=["parquet"])
    W = res["rotation"]
    ems = unmix_stage.induce_endmembers_fused(tiles, W, q=3)
    assert np.array_equal(ems, res["endmembers"])


def test_join_repair_recovers_missing_partition(small_corpus, tmp_path):
    """Crash-window pin: abundance manifest complete but a join-rows
    manifest row missing (crash between the two finalizes) — the next
    run re-probes ONLY that partition and republishes its manifest,
    with join rows identical to the untouched run's."""
    import duckdb
    out = str(tmp_path / "repair")
    res = flagship.run_flagship(
        small_corpus, out, tile=synth.TILE, cell_level=synth.CELL_LEVEL,
        q=3, k_knn=2)
    jdir = res["join_dir"]
    before = duckdb.sql(
        f"SELECT tile_id, poly_id, kind, rank FROM "
        f"read_parquet('{jdir}/part-*/*.parquet') "
        f"ORDER BY tile_id, kind, rank, poly_id").df()
    # simulate the crash: drop one join manifest row (+ its data files)
    victims = sorted(ckpt.completed_partitions(jdir))
    victim = victims[0]
    os.remove(os.path.join(jdir, "_manifest", "part-%s.json" % victim))
    ckpt.clear_incomplete_partitions(jdir)
    assert ckpt.completed_partitions(jdir) == set(victims[1:])
    res2 = flagship.run_flagship(
        small_corpus, out, tile=synth.TILE, cell_level=synth.CELL_LEVEL,
        q=3, k_knn=2)
    assert ckpt.completed_partitions(res2["join_dir"]) == set(victims)
    after = duckdb.sql(
        f"SELECT tile_id, poly_id, kind, rank FROM "
        f"read_parquet('{jdir}/part-*/*.parquet') "
        f"ORDER BY tile_id, kind, rank, poly_id").df()
    assert before.equals(after)


def test_induce_guard_volume_holds(flagship_result):
    """Round-3 pin (r02 advisory, medium): the fused reflectance-space
    candidate pool must induce a simplex whose MNF-space volume is not
    materially below the per-tile MNF-space candidate path's (sampled).
    Also exercises the runtime guard machinery end to end."""
    import ray.data
    from unmixing_ray.stages import unmix as unmix_stage
    _corpus, out, res = flagship_result
    tiles = ray.data.read_parquet(os.path.join(out, "tiles"),
                                  file_extensions=["parquet"])
    g = unmix_stage.induce_guard(tiles, res["rotation"], 3,
                                 res["endmembers"], sample_mod=4,
                                 ratio=0.9)
    assert g["vol_sample"] > 0
    assert g["vol_fused"] >= 0.9 * g["vol_sample"], \
        (g["vol_fused"], g["vol_sample"])
    assert not g["fell_back"]


def test_parallelism_invariance(small_corpus, tmp_path):
    """Same endmembers + identical abundance values at different batch
    sizes / concurrency (Ray analogue of test/tests.py:62-82)."""
    outs = []
    for bs, conc in ((16, 1), (128, 2)):
        out = str(tmp_path / f"par{bs}")
        res = flagship.run_flagship(
            small_corpus, out, tile=synth.TILE,
            cell_level=synth.CELL_LEVEL, q=3, k_knn=0,
            unmix_concurrency=conc, unmix_batch_size=bs)
        ab = ckpt.read_output(res["abundances_dir"])
        order = np.argsort(np.asarray(ab["tile_id"].to_pylist()))
        vals = [np.frombuffer(ab["abundance"][int(i)].as_py(),
                              dtype=np.float32) for i in order]
        outs.append((res["endmembers"], np.concatenate(vals)))
    assert np.array_equal(outs[0][0], outs[1][0])
    assert np.array_equal(outs[0][1], outs[1][1])


def _part_file_counts(d):
    """{partition token: n parquet files} for a checkpoint directory."""
    out = {}
    for name in sorted(os.listdir(d)):
        pdir = os.path.join(d, name)
        if name.startswith("part-") and os.path.isdir(pdir):
            out[name.split("=", 1)[-1]] = len(
                [f for f in os.listdir(pdir) if f.endswith(".parquet")])
    return out


def test_flagship_compaction_audit(small_corpus, tmp_path):
    """VERDICT r03 item 7: flagship-level compaction audit. A run with
    small write batches leaves multi-file partitions; a resumed run with
    ``compact_max_files=1`` (a) recomputes nothing, (b) bounds every
    completed partition to one file, (c) preserves rows and manifest
    completeness, and (d) a further resume leaves the compacted files
    untouched (resume semantics unchanged)."""
    out = str(tmp_path / "cmp")
    kw = dict(tile=synth.TILE, cell_level=synth.CELL_LEVEL, q=3,
              k_knn=2, unmix_batch_size=8)
    res = flagship.run_flagship(small_corpus, out, **kw)
    dirs = [os.path.join(out, "tiles"), res["abundances_dir"],
            res["join_dir"]]
    before = {d: _part_file_counts(d) for d in dirs}
    # the streaming writer left at least one multi-file partition
    assert any(max(c.values()) > 1 for c in before.values()), before
    rows_before = {d: ckpt.read_output(d).num_rows for d in dirs}
    done_before = {d: ckpt.completed_partitions(d) for d in dirs}
    join_before = ckpt.read_output(res["join_dir"]).to_pandas()
    join_before = join_before.sort_values(
        ["tile_id", "kind", "rank", "poly_id"]).reset_index(drop=True)

    res2 = flagship.run_flagship(small_corpus, out, compact_max_files=1,
                                 **kw)
    after = {d: _part_file_counts(d) for d in dirs}
    for d in dirs:
        assert max(after[d].values()) <= 1, (d, after[d])
        assert set(after[d]) == set(before[d])
        assert ckpt.completed_partitions(d) == done_before[d]
        assert ckpt.read_output(d).num_rows == rows_before[d]
        for r in ckpt.read_manifest(d):
            assert r["files"] == 1
    join_after = ckpt.read_output(res2["join_dir"]).to_pandas()
    join_after = join_after.sort_values(
        ["tile_id", "kind", "rank", "poly_id"]).reset_index(drop=True)
    assert join_before[["tile_id", "kind", "rank", "poly_id"]].equals(
        join_after[["tile_id", "kind", "rank", "poly_id"]])

    # third run: nothing recomputed, compacted files byte-identical
    def file_state(d):
        return {os.path.join(p, f): os.stat(os.path.join(d, p, f)).st_mtime_ns
                for p in os.listdir(d) if p.startswith("part-")
                for f in os.listdir(os.path.join(d, p))
                if f.endswith(".parquet")}
    state2 = {d: file_state(d) for d in dirs}
    flagship.run_flagship(small_corpus, out, compact_max_files=1, **kw)
    assert {d: file_state(d) for d in dirs} == state2

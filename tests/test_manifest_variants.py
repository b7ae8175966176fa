"""Non-default plan variants: sort-based groupby checkpoint writer and
the actor-pool spatial join — kept as options, must stay correct."""

import os

import numpy as np
import pytest

import ray.data

from unmixing_ray.state import manifest as ckpt

pytestmark = pytest.mark.usefixtures("ray_session")


def test_groupby_checkpoint_writer(tmp_path):
    rows = [{"part": i % 3, "tile_id": "t%04d" % i, "v": i}
            for i in range(30)]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "gb")
    lineage = ckpt.checkpointed_write(ds, out, "part")
    assert len(lineage) == 3
    back = ckpt.read_output(out)
    assert back.num_rows == 30
    assert ckpt.completed_partitions(out) == {"0", "1", "2"}
    # resume filter drops all completed rows
    remaining, skipped = ckpt.resume_filter(ds, out, "part")
    assert skipped == 3
    assert remaining.count() == 0


def test_streaming_writer_equivalent_rows(tmp_path):
    rows = [{"part": i % 3, "tile_id": "t%04d" % i, "v": i}
            for i in range(30)]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "st")
    agg, sides = ckpt.checkpointed_write_streaming(ds, out, "part")
    assert sum(a["rows"] for a in agg.values()) == 30
    back = ckpt.read_output(out)
    assert sorted(back["v"].to_pylist()) == list(range(30))


def test_actor_join_equals_task_join(small_corpus):
    import pyarrow.parquet as pq
    from unmixing_ray.sources import images as src
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import decode as dstage
    from unmixing_ray.stages import join as jstage
    ds = src.read_images(small_corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=16)
    polygons = pq.read_table(os.path.join(small_corpus,
                                          "polygons.parquet"))
    a = jstage.broadcast_spatial_join(tiles, polygons, k=2,
                                      use_actors=False).to_pandas()
    b = jstage.broadcast_spatial_join(tiles, polygons, k=2,
                                      use_actors=True,
                                      concurrency=2).to_pandas()
    key = ["tile_id", "kind", "rank", "poly_id"]
    a2 = a.sort_values(key).reset_index(drop=True)
    b2 = b.sort_values(key).reset_index(drop=True)
    assert a2[key].equals(b2[key])
    assert np.allclose(a2["dist"], b2["dist"])


def test_compact_partitions(tmp_path):
    """VERDICT r02 item 10: per-partition compaction bounds the file
    count left by the streaming writer without changing rows, and keeps
    the partition 'complete' (manifest row republished)."""
    import glob
    out = str(tmp_path / "cp")
    # many tiny write batches -> several files per partition, ONE
    # finalize after the pass (the real writer protocol)
    import pyarrow as pa
    writer = ckpt.make_streaming_partition_writer(out, "part")
    metrics = []
    for lo in range(0, 40, 5):
        rows = [{"part": i % 2, "tile_id": "t%04d" % i, "v": i}
                for i in range(lo, lo + 5)]
        metrics.extend(writer(pa.Table.from_pylist(rows)).to_pylist())
    ckpt.finalize_streaming_write(metrics, out)
    n_files_before = len(glob.glob(os.path.join(out, "part-*",
                                                "*.parquet")))
    assert n_files_before > 4
    n = ckpt.compact_partitions(out, max_files=1)
    assert n == 2
    n_files_after = len(glob.glob(os.path.join(out, "part-*",
                                               "*.parquet")))
    assert n_files_after == 2
    assert ckpt.completed_partitions(out) == {"0", "1"}
    back = ckpt.read_output(out)
    assert sorted(back["v"].to_pylist()) == list(range(40))
    for r in ckpt.read_manifest(out):
        assert r["files"] == 1

"""The flagship pipeline (north star end-to-end):

    read images → decode+tile (+mask chain) → [checkpoint tiles parquet]
    → MNF fit (partials pass) → endmember induction (NFINDR on pooled
    per-tile candidates | distributed PPI) → MNF project + FCLS actor pool
    → abundance tiles → spatial join (PIP + kNN vs polygons)
    → checkpoint-partitioned writes with per-partition lineage.

Scale design: the input is read ONCE; the tiles table is the resumable
checkpoint on storage; every later pass is a column-pruned read of that
parquet (pixels only where needed, metadata-only for the join). No stage
materializes the full dataset in memory. Reference flow: SURVEY.md §3.1
(docs/Overview_LSMA_in_Python.ipynb).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

import ray.data

from ..constants import DEFAULT_CELL_LEVEL, DEFAULT_TILE
from ..sources.images import read_images
from ..stages import decode as decode_stage
from ..stages import join as join_stage
from ..stages import masks as mask_stage
from ..stages import mnf as mnf_stage
from ..stages import unmix as unmix_stage
from ..state import manifest as ckpt


def build_tiles(corpus_dir, out_dir=None, tile=DEFAULT_TILE,
                cell_level=DEFAULT_CELL_LEVEL, clean=True,
                checkpoint=True, partition_shift=12, with_mnf_stats=False,
                with_candidates=False):
    """Images → (masked) tiles. With ``checkpoint`` the tiles table is
    written partitioned-by-coarse-cell and re-read (the resume point);
    otherwise the lazy Dataset is returned directly.

    ``with_mnf_stats`` / ``with_candidates``: piggyback MNF partial
    statistics and/or per-tile endmember candidates on the write pass
    (side channel) so neither needs its own full read; only valid when
    nothing was resumed — returns (tiles, (stats_or_None, pool_or_None))
    with the tuple None on resumed runs.
    """
    import ray
    n_blocks = max(16, 4 * int(ray.cluster_resources().get("CPU", 8))) \
        if ray.is_initialized() else 32
    ds = read_images(corpus_dir, override_num_blocks=n_blocks)
    fn = decode_stage.make_decode_and_tile(tile=tile, cell_level=cell_level)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=32)
    if clean:
        tiles = tiles.map_batches(mask_stage.make_clean_stage(),
                                  batch_format="pyarrow", batch_size=64)
    want_side = with_mnf_stats or with_candidates
    if not checkpoint:
        return (tiles, None) if want_side else tiles
    tiles_dir = os.path.join(out_dir, "tiles")

    def add_part(batch):
        import pyarrow as pa
        part = (batch["cell"].to_numpy(zero_copy_only=False)
                >> np.uint64(partition_shift)).astype(np.uint64)
        return batch.append_column("part", pa.array(part, pa.uint64()))

    parted = tiles.map_batches(add_part, batch_format="pyarrow")
    remaining, skipped = ckpt.resume_filter(parted, tiles_dir, "part")
    side_fn = None
    if want_side:
        def side_fn(batch):
            # both side channels consume the same float64 NoData-zeroed
            # view of the batch's pixels; converting once and sharing it
            # halves the dominant memory-streaming cost of the write pass
            side = {}
            a = None
            if with_mnf_stats and with_candidates:
                _arrays, a = mnf_stage.zeroed_float64(batch)
            if with_mnf_stats:
                side["stats"] = (mnf_stage.partial_stats_side(a)
                                 if a is not None
                                 else mnf_stage.batch_partial_stats(batch))
            if with_candidates:
                side["cand"] = unmix_stage.candidates_side_channel(
                    batch, pre_zeroed=a)
            return side
    _agg, sides = ckpt.checkpointed_write_streaming(
        remaining, tiles_dir, "part", stage="tiles", side_fn=side_fn)
    out = ray.data.read_parquet(tiles_dir, file_extensions=["parquet"])
    if want_side:
        # side results only cover freshly-written batches; a resumed run
        # must recompute from the full checkpoint
        if sides and skipped == 0:
            stats = mnf_stage.merge_partial_stats(
                [s["stats"] for s in sides]) if with_mnf_stats else None
            pool = None
            if with_candidates:
                pool = unmix_stage.merge_side_pools(
                    [s["cand"] for s in sides])
            return out, (stats, pool)
        return out, None
    return out


def _repair_join_partitions(tiles, polygons, k_knn, missing, join_dir,
                            partition_shift=12):
    """Re-probe ONLY the partitions whose abundance manifest is complete
    but whose join manifest is not (crash window between the two
    finalizes, or a pre-round-3 layout). Bounded by the missing set —
    never a full re-join."""
    import pyarrow as pa
    from ..state import manifest as _ckpt
    missing_set = set(str(m) for m in missing)

    def keep(batch: pa.Table) -> pa.Table:
        part = (batch["cell"].to_numpy(zero_copy_only=False)
                >> np.uint64(partition_shift)).astype(np.uint64)
        mask = pa.array([str(v) in missing_set for v in part], pa.bool_())
        return batch.filter(mask)

    probe = tiles.select_columns(["tile_id", "cell", "cx", "cy"])\
        .map_batches(keep, batch_format="pyarrow")
    rows = join_stage.broadcast_spatial_join(probe, polygons, k=k_knn)

    def add_p(batch: pa.Table) -> pa.Table:
        part = (batch["cell"].to_numpy(zero_copy_only=False)
                >> np.uint64(partition_shift)).astype(np.uint64)
        return batch.append_column("part", pa.array(part, pa.uint64()))

    parted = rows.map_batches(add_p, batch_format="pyarrow")
    _ckpt.checkpointed_write_streaming(parted, join_dir, "part",
                                       stage="join_rows")
    still = missing_set - _ckpt.completed_partitions(join_dir)
    if still:   # legitimately zero join rows in these partitions
        _ckpt.finalize_streaming_write(
            [{"partition": t, "rows": 0, "bytes": 0, "wall_ms": 0.0}
             for t in sorted(still)], join_dir, stage="join_rows")


def run_flagship(corpus_dir, out_dir, tile=DEFAULT_TILE,
                 cell_level=DEFAULT_CELL_LEVEL, q=3, k_knn=2,
                 induce="nfindr", clean=True, checkpoint=True,
                 unmix_concurrency=None, unmix_batch_size=64,
                 induce_guard_mod=None, induce_guard_ratio=0.9,
                 compact_max_files=None):
    """Run the full pipeline; returns dict of result handles.

    ``induce_guard_mod``: when set (e.g. 50), run the fused-induce
    volume guard — one extra column-pruned pass over a ~1/mod tile
    sample comparing the fused pool's NFINDR simplex volume against
    per-tile MNF-space candidates, re-refining over the union if the
    fused volume dropped below ``induce_guard_ratio`` of the sample's
    (see stages/unmix.py:induce_guard). Off by default: the quality
    bound is pinned by tests/test_flagship.py on the synthetic corpus;
    enable on unfamiliar corpora."""
    import time
    timings = {}
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.monotonic()
    want_cand = induce == "nfindr"
    if checkpoint:
        tiles, fused = build_tiles(corpus_dir, out_dir, tile, cell_level,
                                   clean, checkpoint,
                                   with_mnf_stats=True,
                                   with_candidates=want_cand)
    else:
        tiles = build_tiles(corpus_dir, out_dir, tile, cell_level, clean,
                            checkpoint)
        fused = None
    timings["tiles_checkpoint"] = round(time.monotonic() - t0, 3)

    # MNF fit: fused into the checkpoint pass when possible, else one
    # streaming pass reduced to tiny partials
    t0 = time.monotonic()
    if fused is not None:
        (W, snr), pool = fused[0], fused[1]
    else:
        W, snr = mnf_stage.fit_mnf(tiles)
        pool = None
    timings["mnf_fit"] = round(time.monotonic() - t0, 3)
    # the FCLS stage reads only the first q-1 MNF components + metadata:
    # dropping the raw pixel/qa payloads and truncating the projection
    # cuts the bytes exchanged into the actor pool ~5x (bandwidth is the
    # measured single-node scaling ceiling); FCLS output is identical —
    # the actor used only those components anyway (k = q-1 dim drop)
    unmix_apply = mnf_stage.make_apply_mnf(
        W, drop=("pixels", "qa"), n_components=max(1, q - 1))
    # qa is dead weight in this pass (masks ran pre-checkpoint and
    # apply_mnf drops it unread) — prune it at the parquet read instead
    # of decoding ~1 KB/tile only to discard it
    schema_names = tiles.schema().names
    pruned = tiles.select_columns(
        [c for c in schema_names if c != "qa"]) \
        if "qa" in schema_names else tiles
    tiles_mnf = pruned.map_batches(unmix_apply, batch_format="pyarrow",
                                   batch_size=64)

    # endmember induction: the NFINDR path refines the candidate pool
    # piggybacked on the write pass (no extra Dataset execution); a
    # resumed run recomputes the SAME pool from the checkpoint with one
    # column-pruned pass (bit-identical merge), PPI keeps its own pass
    t0 = time.monotonic()
    if induce == "ppi":
        # PPI skewers span the FULL MNF space — no component truncation
        ppi_apply = mnf_stage.make_apply_mnf(W, drop=("pixels",))
        lean = tiles.select_columns(
            ["tile_id", "bands", "h", "w", "pixels"]).map_batches(
            ppi_apply, batch_format="pyarrow", batch_size=64)
        endmembers = unmix_stage.ppi_global(lean, q=q)
    elif pool is not None:
        endmembers = unmix_stage.nfindr_from_pool(pool, W, q=q)
    else:
        endmembers = unmix_stage.induce_endmembers_fused(tiles, W, q=q)
    timings["induce"] = round(time.monotonic() - t0, 3)
    guard_info = None
    if induce == "nfindr" and induce_guard_mod:
        t0 = time.monotonic()
        g = unmix_stage.induce_guard(
            tiles, W, q, endmembers, sample_mod=induce_guard_mod,
            ratio=induce_guard_ratio)
        endmembers = g["endmembers"]
        guard_info = {k: g[k] for k in ("vol_fused", "vol_sample",
                                        "fell_back")}
        timings["induce_guard"] = round(time.monotonic() - t0, 3)

    # FCLS actor pool → abundance tiles → checkpointed partitioned write
    abundances = unmix_stage.unmix(
        tiles_mnf, endmembers, concurrency=unmix_concurrency,
        batch_size=unmix_batch_size)
    ab_dir = os.path.join(out_dir, "abundances")

    def add_part(batch):
        import pyarrow as pa
        part = (batch["cell"].to_numpy(zero_copy_only=False)
                >> np.uint64(12)).astype(np.uint64)
        return batch.append_column("part", pa.array(part, pa.uint64()))

    t0 = time.monotonic()
    ab_parted = abundances.map_batches(add_part, batch_format="pyarrow")
    remaining, skipped_ab = ckpt.resume_filter(ab_parted, ab_dir, "part")
    # the spatial join probes ride the unmix write pass as a side channel
    # (tile centroids vs the broadcast polygon table) and are written to
    # their OWN checkpointed partition layout from inside the stage —
    # only tiny per-partition metric rows reach the driver (round 2
    # ferried every join row through driver-collected pickle blobs)
    polygons = pq.read_table(os.path.join(corpus_dir, "polygons.parquet"))
    import ray as _ray
    poly_ref = _ray.put(polygons)
    join_dir = os.path.join(out_dir, "join_rows")
    ckpt.clear_incomplete_partitions(join_dir)
    join_writer = ckpt.make_streaming_partition_writer(
        join_dir, "part", stage="join_rows")

    def join_side(batch):
        import pyarrow as pa
        actor = join_stage.cached_probe_actor(poly_ref, k_knn)
        jt = actor(batch)
        part = (jt["cell"].to_numpy(zero_copy_only=False)
                >> np.uint64(12)).astype(np.uint64)
        jt = jt.append_column("part", pa.array(part, pa.uint64()))
        metrics = join_writer(jt).to_pylist() if jt.num_rows else []
        # partitions whose tiles produced no join rows still need a
        # manifest row (else the repair pass re-probes them every run)
        covered = {m["partition"] for m in metrics}
        ab_parts = np.unique(batch["part"].to_numpy(zero_copy_only=False))
        for v in ab_parts:
            tok = str(v)
            if tok not in covered:
                metrics.append({"partition": tok, "rows": 0, "bytes": 0,
                                "wall_ms": 0.0})
        return {"join_metrics": metrics}

    _agg2, join_sides = ckpt.checkpointed_write_streaming(
        remaining, ab_dir, "part", stage="abundances", side_fn=join_side)
    lineage = ckpt.read_manifest(ab_dir)
    timings["unmix_write"] = round(time.monotonic() - t0, 3)

    # publish the join manifest; repair partitions whose abundance rows
    # are complete but whose join rows are not (resumed run whose prior
    # crash hit the window between the two finalizes)
    t0 = time.monotonic()
    join_metrics = [m for s in join_sides
                    for m in (s or {}).get("join_metrics", [])]
    ckpt.finalize_streaming_write(join_metrics, join_dir,
                                  stage="join_rows")
    if checkpoint:
        missing = sorted(ckpt.completed_partitions(ab_dir)
                         - ckpt.completed_partitions(join_dir))
        if missing:
            _repair_join_partitions(tiles, polygons, k_knn, missing,
                                    join_dir)
    timings["spatial_join"] = round(time.monotonic() - t0, 3)

    # integrity: every checkpointed tile must have an abundance row (the
    # manifests cover completed partitions across ALL runs, so this holds
    # for resumed runs too); a mismatch means lost write metrics (e.g.
    # worker death under memory pressure) and must be loud, not silent
    tiles_rows = sum(r["rows"] for r in
                     ckpt.read_manifest(os.path.join(out_dir, "tiles"))) \
        if checkpoint else None
    ab_rows = sum(r["rows"] for r in lineage)
    if checkpoint and tiles_rows != ab_rows:
        import sys
        print("WARNING: abundance manifest covers %d rows but the tiles "
              "checkpoint has %d — rerun to resume the missing "
              "partitions" % (ab_rows, tiles_rows), file=sys.stderr)

    # optional post-pass compaction: bound the per-partition file count
    # the streaming writer leaves (one file per (partition, batch))
    if compact_max_files:
        for d in ((os.path.join(out_dir, "tiles"),) if checkpoint
                  else ()) + (ab_dir, join_dir):
            ckpt.compact_partitions(d, max_files=compact_max_files)

    return {
        "rotation": W,
        "snr": snr,
        "endmembers": endmembers,
        "induce_guard": guard_info,
        "abundances_dir": ab_dir,
        "join_dir": join_dir,
        "lineage": lineage,
        "timings": timings,
        "integrity": {"tiles_rows": tiles_rows,
                      "abundance_rows": ab_rows},
    }

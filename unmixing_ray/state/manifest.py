"""Checkpoint-resumable partitioned output with per-partition lineage.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". Layout:

    out_dir/
      part-<key>=<value>/data.parquet     (atomic: tmp + rename)
      _manifest/part-<...>.json           (one row per finished partition)

A partition is complete iff its manifest row exists (the rename of the
data file happens first, the manifest row last, so a crash leaves at most
an orphaned data file that is rewritten on resume). ``resume_filter``
drops already-finished partitions from the input (anti-join against the
manifest) before re-running — the reference has no analogue (SURVEY.md
§4.2 row "checkpoint / resume").
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _manifest_dir(out_dir):
    return os.path.join(out_dir, "_manifest")


def completed_partitions(out_dir):
    """Set of partition values with a manifest row."""
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                done.add(json.load(f)["partition"])
    return done


def read_manifest(out_dir):
    """All manifest rows (lineage + metrics) as a list of dicts."""
    mdir = _manifest_dir(out_dir)
    rows = []
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    rows.append(json.load(f))
    return rows


def make_partition_writer(out_dir, partition_col, stage="write"):
    """A map_groups(batch_format='pyarrow') function writing one partition
    per group atomically and returning its lineage/metrics row."""
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)

    def write_group(group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        part_val = group[partition_col][0].as_py()
        token = str(part_val)
        pdir = os.path.join(out_dir, "part-%s=%s" % (partition_col, token))
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp.%d" % os.getpid())
        pq.write_table(group, tmp)
        final = os.path.join(pdir, "data.parquet")
        os.replace(tmp, final)
        row = {
            "partition": token,
            "stage": stage,
            "rows": group.num_rows,
            "bytes": os.path.getsize(final),
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
        }
        mtmp = os.path.join(_manifest_dir(out_dir),
                            ".part-%s.json.tmp.%d" % (token, os.getpid()))
        with open(mtmp, "w") as f:
            json.dump(row, f)
        os.replace(mtmp, os.path.join(_manifest_dir(out_dir),
                                      "part-%s.json" % token))
        return pa.table({
            "partition": pa.array([token], pa.string()),
            "rows": pa.array([row["rows"]], pa.int64()),
            "bytes": pa.array([row["bytes"]], pa.int64()),
            "wall_ms": pa.array([row["wall_ms"]], pa.float64()),
        })

    return write_group


def checkpointed_write(ds, out_dir, partition_col, stage="write"):
    """groupby(partition_col) → atomic per-partition parquet + manifest.
    Returns the small lineage table (one row per partition written)."""
    writer = make_partition_writer(out_dir, partition_col, stage)
    return ds.groupby(partition_col).map_groups(
        writer, batch_format="pyarrow").to_pandas()


def make_streaming_partition_writer(out_dir, partition_col,
                                    stage="write", side_fn=None):
    """Shuffle-free partitioned writer: a map_batches fn that splits each
    batch by partition value and appends one atomic file per (partition,
    batch) — file names are content-hashed so Ray task retries overwrite
    the same file (idempotent). Returns per-split metric rows; call
    ``finalize_streaming_write`` with the collected rows to publish the
    per-partition manifest (the completion marker).

    Rationale: the groupby-based writer's sort shuffle cost ~40 s on a
    600 MB / 190-partition abundance write at 32 CPUs; this streams at
    full map parallelism with zero data movement.
    """
    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    # parquet codec (+ level) for checkpoint data: overridable for
    # bandwidth experiments (the sandbox's memory bus is the measured
    # single-node scaling ceiling — see bench.py --bandwidth-control
    # and the round-5 byte-diet entry in BASELINE.md)
    codec = os.environ.get("RAY_UNMIX_PARQUET_CODEC", "snappy")
    _lvl = os.environ.get("RAY_UNMIX_PARQUET_CODEC_LEVEL")
    codec_level = int(_lvl) if _lvl else None

    def write_batch(batch: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        parts = batch[partition_col].to_numpy(zero_copy_only=False)
        out = {"partition": [], "rows": [], "bytes": [], "wall_ms": []}
        import numpy as np
        for val in np.unique(parts):
            sel = batch.filter(pc.equal(batch[partition_col], val))
            token = str(val)
            pdir = os.path.join(out_dir,
                                "part-%s=%s" % (partition_col, token))
            os.makedirs(pdir, exist_ok=True)
            key_col = "tile_id" if "tile_id" in sel.column_names else \
                sel.column_names[0]
            digest = hashlib.blake2b(
                "".join(map(str, sel[key_col].to_pylist())).encode(),
                digest_size=10).hexdigest()
            tmp = os.path.join(pdir, ".data-%s.tmp.%d" % (digest,
                                                          os.getpid()))
            pq.write_table(sel, tmp, compression=codec,
                           compression_level=codec_level)
            final = os.path.join(pdir, "data-%s.parquet" % digest)
            os.replace(tmp, final)
            out["partition"].append(token)
            out["rows"].append(sel.num_rows)
            out["bytes"].append(os.path.getsize(final))
            out["wall_ms"].append(
                round((time.monotonic() - t0) * 1000.0, 3))
        tbl = pa.table({
            "partition": pa.array(out["partition"], pa.string()),
            "rows": pa.array(out["rows"], pa.int64()),
            "bytes": pa.array(out["bytes"], pa.int64()),
            "wall_ms": pa.array(out["wall_ms"], pa.float64()),
        })
        if side_fn is not None and batch.num_rows and tbl.num_rows:
            # piggyback per-batch side computation (e.g. MNF partial
            # statistics) on the write pass so it doesn't need its own
            # full read of the data
            import pickle
            side = pickle.dumps(side_fn(batch))
            blobs = [side] + [None] * (tbl.num_rows - 1)
            tbl = tbl.append_column("side", pa.array(blobs, pa.binary()))
        elif side_fn is not None:
            tbl = tbl.append_column(
                "side", pa.nulls(tbl.num_rows, pa.binary()))
        return tbl

    return write_batch


def collect_side_results(metric_rows):
    """Unpickle the side-channel blobs from writer metric rows."""
    import pickle
    out = []
    for r in metric_rows:
        blob = r.get("side")
        if blob:
            out.append(pickle.loads(blob))
    return out


def finalize_streaming_write(metric_rows, out_dir, stage="write"):
    """Publish per-partition manifest rows (the atomic completion marker)
    from the collected writer metrics. Must run after the write pass
    completed; partitions without a manifest row are re-written (and
    their orphan files cleared) on resume."""
    agg = {}
    for r in metric_rows:
        if not r["partition"]:
            continue  # side-channel-only placeholder row
        a = agg.setdefault(r["partition"],
                           {"rows": 0, "bytes": 0, "wall_ms": 0.0,
                            "files": 0})
        a["rows"] += int(r["rows"])
        a["bytes"] += int(r["bytes"])
        a["wall_ms"] += float(r["wall_ms"])
        a["files"] += 1
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    for token, a in sorted(agg.items()):
        row = {"partition": token, "stage": stage, "rows": a["rows"],
               "bytes": a["bytes"], "wall_ms": round(a["wall_ms"], 3),
               "files": a["files"]}
        tmp = os.path.join(mdir, ".part-%s.json.tmp.%d" % (token,
                                                           os.getpid()))
        with open(tmp, "w") as f:
            json.dump(row, f)
        os.replace(tmp, os.path.join(mdir, "part-%s.json" % token))
    return agg


def clear_incomplete_partitions(out_dir):
    """Delete data files of partitions without a manifest row (orphans
    from a crashed run) so a resume rewrites them cleanly."""
    done = completed_partitions(out_dir)
    removed = 0
    if not os.path.isdir(out_dir):
        return 0
    for name in os.listdir(out_dir):
        if not name.startswith("part-"):
            continue
        token = name.split("=", 1)[-1]
        if token in done:
            continue
        pdir = os.path.join(out_dir, name)
        for f in os.listdir(pdir):
            os.remove(os.path.join(pdir, f))
            removed += 1
    return removed


def checkpointed_write_streaming(ds, out_dir, partition_col,
                                 stage="write", side_fn=None):
    """Shuffle-free checkpointed write: clear orphans, stream batches to
    per-partition files, publish the manifest. Returns (per-partition
    metrics dict, side results list)."""
    clear_incomplete_partitions(out_dir)
    writer = make_streaming_partition_writer(out_dir, partition_col,
                                             stage, side_fn=side_fn)
    rows = ds.map_batches(writer, batch_format="pyarrow").take_all()
    agg = finalize_streaming_write(rows, out_dir, stage)
    return agg, collect_side_results(rows)


def compact_partitions(out_dir, max_files=8):
    """Merge each completed partition's data files into one when the
    streaming writer left more than ``max_files`` (one file per
    (partition, batch) grows with batch count — VERDICT r02 item 10).

    Crash-safe under the existing recovery contract: the partition's
    manifest row is removed FIRST (making it "incomplete"), then the old
    files are swapped for the combined file, then the manifest row is
    republished. A crash anywhere in between leaves an incomplete
    partition that ``clear_incomplete_partitions`` + resume rewrites
    from the (immutable) source — never silent duplication or loss.
    Returns the number of partitions compacted."""
    import hashlib
    done = completed_partitions(out_dir)
    mdir = _manifest_dir(out_dir)
    compacted = 0
    if not os.path.isdir(out_dir):
        return 0
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if not (name.startswith("part-") and os.path.isdir(pdir)):
            continue
        token = name.split("=", 1)[-1]
        if token not in done:
            continue
        files = sorted(f for f in os.listdir(pdir)
                       if f.endswith(".parquet"))
        if len(files) <= max_files:
            continue
        with open(os.path.join(mdir, "part-%s.json" % token)) as f:
            row = json.load(f)
        combined = pa.concat_tables(
            [pq.read_table(os.path.join(pdir, f)) for f in files])
        assert combined.num_rows == row["rows"], \
            "partition %s: %d rows on disk vs %d in manifest" % (
                token, combined.num_rows, row["rows"])
        digest = hashlib.blake2b(
            ("compact:" + ":".join(files)).encode(),
            digest_size=10).hexdigest()
        tmp = os.path.join(pdir, ".data-%s.tmp.%d" % (digest,
                                                      os.getpid()))
        pq.write_table(combined, tmp)
        # 1) retract the manifest row -> partition is now "incomplete"
        os.remove(os.path.join(mdir, "part-%s.json" % token))
        # 2) swap the files
        for f in files:
            os.remove(os.path.join(pdir, f))
        final = os.path.join(pdir, "data-%s.parquet" % digest)
        os.replace(tmp, final)
        # 3) republish the manifest row
        row["bytes"] = os.path.getsize(final)
        row["files"] = 1
        mtmp = os.path.join(mdir, ".part-%s.json.tmp.%d" % (token,
                                                            os.getpid()))
        with open(mtmp, "w") as f:
            json.dump(row, f)
        os.replace(mtmp, os.path.join(mdir, "part-%s.json" % token))
        compacted += 1
    return compacted


def resume_filter(ds, out_dir, partition_col):
    """Drop rows of already-completed partitions (broadcast anti-join on
    the manifest key set inside map_batches)."""
    done = completed_partitions(out_dir)
    if not done:
        return ds, 0

    def drop_done(batch: pa.Table) -> pa.Table:
        vals = [str(v) for v in batch[partition_col].to_pylist()]
        keep = pa.array([v not in done for v in vals], pa.bool_())
        return batch.filter(keep)

    return ds.map_batches(drop_done, batch_format="pyarrow"), len(done)


def read_output(out_dir):
    """Read back all finished partitions as one pyarrow Table (supports
    both the one-file-per-partition and streaming multi-file layouts)."""
    parts = []
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if not (name.startswith("part-") and os.path.isdir(pdir)):
            continue
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                parts.append(pq.read_table(os.path.join(pdir, f)))
    return pa.concat_tables(parts) if parts else None

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
    """Read back all finished partitions as one pyarrow Table."""
    parts = []
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name, "data.parquet")
        if name.startswith("part-") and os.path.exists(p):
            parts.append(pq.read_table(p))
    return pa.concat_tables(parts) if parts else None

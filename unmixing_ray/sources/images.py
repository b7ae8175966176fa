"""Input-table reader facade.

The north star names a Lance table of image+caption pairs; ``lance`` is not
installable in this environment, so the facade reads the schema-identical
parquet layout and will prefer ``ray.data.read_lance`` when a ``.lance``
dataset and the lance reader are available (SURVEY.md §7c).

Reference analogue: ``as_array``/``as_raster`` (utils.py:45-63,106-115)
open one file at a time; here the "open" is a distributed columnar read
with column pruning.
"""

from __future__ import annotations

import os

import ray.data


IMAGE_COLUMNS = [
    "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "qa",
    "gt", "crs",
]


def read_images(corpus_dir, columns=None, **kwargs):
    """Read the images table as a Ray Dataset, pruning to ``columns``."""
    lance_path = os.path.join(corpus_dir, "images.lance")
    if os.path.exists(lance_path) and hasattr(ray.data, "read_lance"):
        try:
            return ray.data.read_lance(lance_path, columns=columns, **kwargs)
        except Exception:
            pass  # fall back to parquet
    sharded = os.path.join(corpus_dir, "images")
    path = sharded if os.path.isdir(sharded) else \
        os.path.join(corpus_dir, "images.parquet")
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_polygons(corpus_dir, columns=None, **kwargs):
    path = os.path.join(corpus_dir, "polygons.parquet")
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def ensure_documents_jsonl(sf_dir, cache_root="/tmp/ray_unmix_data"):
    """Materialize documents.parquet as sharded JSONL (newline-delimited
    JSON — the wire format text corpora actually arrive in) under the
    corpus cache, once. Deterministic: rows in doc_id order, 4 shards
    by doc_id ranges, compact separators."""
    import json
    import pathlib

    import pyarrow.dataset as pads

    sf = os.path.basename(str(sf_dir).rstrip("/"))
    out = pathlib.Path(cache_root) / sf / "documents_jsonl"
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    tbl = pads.dataset(os.path.join(str(sf_dir), "documents.parquet"),
                       format="parquet").to_table()
    rows = tbl.sort_by("doc_id").to_pylist()
    n_shards = 4
    per = (len(rows) + n_shards - 1) // max(1, n_shards)
    for s in range(n_shards):
        with open(out / ("part-%02d.jsonl" % s), "w") as f:
            for r in rows[s * per:(s + 1) * per]:
                f.write(json.dumps(r, separators=(",", ":"),
                                   sort_keys=True) + "\n")
    done.write_text("jsonl v1")
    return str(out)


def read_documents_jsonl(sf_dir, **kwargs):
    """Documents via ``ray.data.read_json`` over the sharded JSONL
    mirror — the ingest path for corpora that arrive as JSONL dumps
    (Common Crawl derivatives, API exports). Downstream operators are
    source-agnostic: the Dataset is schema-identical to the parquet
    read."""
    kwargs.setdefault("file_extensions", ["jsonl"])
    return ray.data.read_json(ensure_documents_jsonl(sf_dir), **kwargs)


def ensure_events_csv(sf_dir, cache_root="/tmp/ray_unmix_data"):
    """Materialize the events table as sharded CSV (timestamps as
    int64 microseconds — string timestamp inference differs between
    readers; integers parse identically everywhere), once."""
    import pathlib

    import pyarrow as pa
    import pyarrow.csv as pacsv
    import pyarrow.dataset as pads

    sf = os.path.basename(str(sf_dir).rstrip("/"))
    out = pathlib.Path(cache_root) / sf / "events_csv"
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    tbl = pads.dataset(os.path.join(str(sf_dir), "events.parquet"),
                       format="parquet").to_table(
        columns=["event_id", "ts", "user_id", "event_type", "value"])
    tbl = tbl.sort_by("event_id")
    ts_us = tbl["ts"].cast(pa.int64())
    tbl = tbl.set_column(tbl.column_names.index("ts"), "ts_us", ts_us)
    n_shards = 4
    per = (tbl.num_rows + n_shards - 1) // max(1, n_shards)
    for s in range(n_shards):
        pacsv.write_csv(tbl.slice(s * per, per),
                        str(out / ("part-%02d.csv" % s)))
    done.write_text("csv v1")
    return str(out)


def read_events_csv(sf_dir, **kwargs):
    """Events via ``ray.data.read_csv`` over the sharded CSV mirror —
    the ingest path for log dumps that arrive as CSV. Downstream
    operators see (event_id, ts_us:int64, user_id, event_type,
    value)."""
    kwargs.setdefault("file_extensions", ["csv"])
    return ray.data.read_csv(ensure_events_csv(sf_dir), **kwargs)

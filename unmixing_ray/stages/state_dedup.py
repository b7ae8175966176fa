"""Streaming exact dedup against a SHARED MUTABLE INDEX — the one
operator class in this engine built on raw ``@ray.remote`` actors.

Everything else in the engine is a Dataset-API composition; this module
exists because "filter each record against state that every other
in-flight record may have just mutated" is the documented case the
Dataset API genuinely cannot express (a groupby dedup needs the full
shuffle before ANY row is emitted — a streaming admission filter emits
verdicts while the stream flows, the shape an online ingest /
crawl-frontier dedup needs).

Design (the sharded-index pattern, stated per the engine contract):
- the index is HASH-SHARDED over ``num_shards`` plain Ray actors; a
  key's shard is a pure function of its digest, so no two shards ever
  see the same key and shards never coordinate;
- each ``map_batches`` task groups its batch's keys by shard and makes
  ONE batched ``check_and_add`` call per (batch, shard) — never a call
  per row; per-batch RPC payloads are digests only, never documents;
- ``check_and_add`` is atomic per shard (actor = single-threaded), so
  exactly ONE copy of every distinct key is admitted, at any
  parallelism. WHICH copy survives is arrival-order-dependent and
  therefore nondeterministic — callers that need keep-FIRST semantics
  use the shuffle-based ``dedup.exact_dedup_docs`` instead; the
  deterministic contract here is the SET of admitted keys (this is
  what the oracle checks).
- at 10^12 docs each shard holds |distinct|/num_shards digests in RAM;
  scale = more shards (the map stage is already shard-oblivious).
  Restart loses the index (it is a cache, not a ledger): feed admitted
  keys to a checkpointed sink if the index must survive failures.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray


@ray.remote(num_cpus=0.25)
class DedupShardActor:
    """One shard of the admission index: a set of key digests."""

    def __init__(self):
        self._seen = set()

    def check_and_add(self, keys):
        """Batched atomic test-and-set; returns one bool per key
        (True = first sighting anywhere in the stream)."""
        seen = self._seen
        out = []
        for k in keys:
            if k in seen:
                out.append(False)
            else:
                seen.add(k)
                out.append(True)
        return out

    def size(self):
        return len(self._seen)


def streaming_exact_dedup(docs, text_col="text", num_shards=8):
    """Admission-filter ``docs`` so exactly one copy of each distinct
    ``text_col`` content survives (see module docstring for the
    determinism contract). Returns rows with an added ``content_hash``
    column."""
    shards = [DedupShardActor.remote() for _ in range(num_shards)]

    def admit(df: pd.DataFrame) -> pd.DataFrame:
        hs = np.array([hashlib.md5(t.encode()).hexdigest()
                       for t in df[text_col]])
        shard_of = np.array([int(h[:8], 16) % num_shards for h in hs])
        keep = np.zeros(len(df), dtype=bool)
        calls, idxs = [], []
        for s in range(num_shards):
            m = np.flatnonzero(shard_of == s)
            if not len(m):
                continue
            calls.append(shards[s].check_and_add.remote(
                [hs[i] for i in m]))
            idxs.append(m)
        for m, res in zip(idxs, ray.get(calls)):
            keep[m] = res
        out = df[keep].copy()
        out["content_hash"] = hs[keep]
        # arrow out: empty pandas OBJECT batches (an all-duplicate
        # batch) break Ray's block size accounting — and an empty
        # object column converts to a NULL-typed Arrow column, forking
        # the stream's schema, so pin content_hash to string
        import pyarrow as pa
        t = pa.Table.from_pandas(out, preserve_index=False)
        i = t.schema.get_field_index("content_hash")
        return t.set_column(i, "content_hash",
                            t["content_hash"].cast(pa.string()))

    return docs.map_batches(admit, batch_format="pandas")

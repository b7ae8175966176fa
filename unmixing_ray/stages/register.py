"""Image-to-image co-registration: integer translation recovery by
EXACT circular cross-correlation.

The geometric-alignment primitive of every multi-date remote-sensing
stack (band-to-band registration, date-to-date co-registration before
compositing or change detection): given a reference plane and a target
plane that is a shifted copy of it, recover the (dy, dx) translation as
the argmax of the cross-correlation surface over a bounded search
window. This complements the engine's radiometric alignment
(``kernels/rectify.py:hall_rectification``, reference
``unmixing/transform.py``) with the geometric half that the reference
delegates to pre-registered GDAL inputs — here it is a first-class
distributed operator.

Scale shape: ONE stateless ``map_batches`` pass over pair rows — no
shuffle, no driver state, no actor pool needed (nothing is loaded per
task). Planes travel as raw little-endian int16 binary payloads (the
same binary-column discipline as the tile pipeline); per row the
correlation surface is a (2R+1)² stack of integer MACs computed
vectorized (one rolled view stack × one broadcast multiply), all in
int64 so the argmax is exact and bit-stable at any partitioning.

Correctness: every score is an exact int64 Σ a·roll(b, −δ); by
Cauchy–Schwarz the surface peaks at the true shift whenever the plane
is not circularly periodic within the window, and the argmax tiebreak
(score DESC, dy ASC, dx ASC) is deterministic. The oracle plants the
shift as a pure function of the image sequence number
(:func:`planted_shift`) so recovery is closed-form SQL-checkable — a
hash match means the correlation actually found the planted
translation on every image.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def planted_shift(seq: int, max_shift: int = 3):
    """Documented plant spec shared with the SQL oracle:
    dy = seq % (2R+1) − R, dx = (seq // (2R+1)) % (2R+1) − R."""
    m = 2 * max_shift + 1
    return seq % m - max_shift, (seq // m) % m - max_shift


def make_planted_pairs(max_shift: int = 3):
    """images batch (image_id, bytes, w, h, fmt) → pair rows
    (image_id, h, w, ref, tgt): ref = decoded band-0 plane as raw
    int16 LE bytes, tgt = the same plane circularly shifted by
    :func:`planted_shift` of the image's sequence number. Decode
    happens ONCE here; downstream sees only fixed-width payloads."""

    def fn(t: pa.Table) -> pa.Table:
        from ..codecs import decode_image
        ids, refs, tgts, hs, ws = [], [], [], [], []
        for i in range(t.num_rows):
            iid = t["image_id"][i].as_py()
            arr = decode_image(t["bytes"][i].as_py(),
                               t["fmt"][i].as_py(),
                               int(t["w"][i].as_py()),
                               int(t["h"][i].as_py()))
            plane = np.ascontiguousarray(arr[0].astype("<i2"))
            seq = int(iid.lstrip("img"))
            dy, dx = planted_shift(seq, max_shift)
            shifted = np.roll(plane, (dy, dx), axis=(0, 1))
            ids.append(iid)
            hs.append(plane.shape[0])
            ws.append(plane.shape[1])
            refs.append(plane.tobytes())
            tgts.append(np.ascontiguousarray(shifted).tobytes())
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "h": pa.array(hs, pa.int64()),
            "w": pa.array(ws, pa.int64()),
            "ref": pa.array(refs, pa.binary()),
            "tgt": pa.array(tgts, pa.binary())})

    return fn


def recover_shift(ref: np.ndarray, tgt: np.ndarray, max_shift: int = 3):
    """(dy, dx, peak) — argmax of the exact int64 circular
    cross-correlation Σ ref · roll(tgt, −δ) over |δ| ≤ max_shift,
    tiebreak (score DESC, dy ASC, dx ASC)."""
    r64 = ref.astype(np.int64, copy=False)
    offs = [(dy, dx)
            for dy in range(-max_shift, max_shift + 1)
            for dx in range(-max_shift, max_shift + 1)]
    stack = np.stack([np.roll(tgt, (-dy, -dx), axis=(0, 1))
                      for dy, dx in offs])
    scores = (stack.astype(np.int64) * r64[None]).sum(axis=(1, 2))
    best = int(np.argmax(scores))   # first max = smallest (dy, dx)
    return offs[best][0], offs[best][1], int(scores[best])


def coregister(pairs, max_shift: int = 3):
    """pair rows (image_id, h, w, ref, tgt) → (image_id, dy, dx):
    the recovered integer translation per pair."""

    def fn(t: pa.Table) -> pa.Table:
        ids, dys, dxs = [], [], []
        for i in range(t.num_rows):
            h = int(t["h"][i].as_py())
            w = int(t["w"][i].as_py())
            ref = np.frombuffer(t["ref"][i].as_py(),
                                dtype="<i2").reshape(h, w)
            tgt = np.frombuffer(t["tgt"][i].as_py(),
                                dtype="<i2").reshape(h, w)
            dy, dx, _ = recover_shift(ref, tgt, max_shift)
            ids.append(t["image_id"][i].as_py())
            dys.append(dy)
            dxs.append(dx)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "dy": pa.array(dys, pa.int64()),
            "dx": pa.array(dxs, pa.int64())})

    return pairs.map_batches(fn, batch_format="pyarrow", batch_size=64)


def coregister_sql(images_glob: str, max_shift: int = 3) -> str:
    """Closed-form DuckDB replay of the PLANTED shifts — a hash match
    proves the distributed correlation recovered every plant."""
    m = 2 * max_shift + 1
    return f"""
        SELECT image_id,
               CAST(seq % {m} - {max_shift} AS BIGINT) AS dy,
               CAST((seq // {m}) % {m} - {max_shift} AS BIGINT) AS dx
        FROM (SELECT image_id,
                     CAST(substr(image_id, 4) AS BIGINT) AS seq
              FROM read_parquet('{images_glob}'))"""

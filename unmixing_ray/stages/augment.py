"""Deterministic training-data image augmentation (flip + crop).

The augmentation pipeline step every image-training corpus runs before
packing: per-image horizontal/vertical flips and a random crop. The
parameters are a pure function of ``md5(image_id)`` — NO RNG state
travels between tasks, so the transform is bit-reproducible across
runs, nodes, batch boundaries and resumes (the same determinism
contract as relational.split_assign's md5 splits). Growth-stable: adding
images never changes the augmentation of existing ones.

Scale shape: one ``map_batches`` pass over the images table (decode →
flip views → crop slice, all numpy views until the final copy), no
shuffle, no driver state. Output carries integer invariants (a
position-weighted checksum pins every pixel of the augmented array, not
just its sum) plus the caption — caption equality through the transform
is the north-star end-to-end invariant.

Oracle: ``sources/synth.py:generate_augment_expected`` replays the spec
single-machine at corpus-generation time (inline md5 parameter
derivation + per-pixel weighted sum with Python ints).

Reference parity: the reference's augmentation surface is the mask /
subarray family (``unmixing/utils.py`` subarray, lsma.py ravel) — this
op is the engine-new training-data extension over the same decoded
arrays.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def augment_params(image_id: str, h: int, w: int, crop: int):
    """(flip_h, flip_v, oy, ox) from md5(image_id) — the documented
    spec shared with the sidecar oracle."""
    d = hashlib.md5(image_id.encode()).digest()
    flip_h = d[0] & 1
    flip_v = (d[0] >> 1) & 1
    oy = int.from_bytes(d[1:5], "little") % max(1, h - crop + 1)
    ox = int.from_bytes(d[5:9], "little") % max(1, w - crop + 1)
    return flip_h, flip_v, oy, ox


# position weight cycle length: coprime with every plausible crop area,
# so transposed/shifted layouts cannot alias to the same checksum
_W_CYCLE = 251


def weighted_checksum(arr: np.ndarray) -> int:
    """Position-weighted int64 checksum of a (bands, h, w) array: pins
    value AND position of every pixel (a plain sum would accept any
    permutation)."""
    flat = arr.astype(np.int64, copy=False).ravel()
    wts = np.arange(flat.size, dtype=np.int64) % _W_CYCLE + 1
    return int((flat * wts).sum())


def augment_images(images, crop=24):
    """images Dataset (image_id, bytes, w, h, fmt, caption) →
    (image_id, flip_h, flip_v, oy, ox, n_px, aug_checksum, caption).
    """

    def fn(t: pa.Table) -> pa.Table:
        from ..codecs import decode_image
        ids = t["image_id"].to_pylist()
        fmts = t["fmt"].to_pylist()
        ws = t["w"].to_pylist()
        hs = t["h"].to_pylist()
        caps = t["caption"].to_pylist()
        out = {"image_id": [], "flip_h": [], "flip_v": [], "oy": [],
               "ox": [], "n_px": [], "aug_checksum": [], "caption": []}
        for i in range(t.num_rows):
            arr = decode_image(t["bytes"][i].as_py(), fmts[i],
                               int(ws[i]), int(hs[i]))
            fh, fv, oy, ox = augment_params(ids[i], arr.shape[1],
                                            arr.shape[2], crop)
            a = arr
            if fh:
                a = a[:, :, ::-1]
            if fv:
                a = a[:, ::-1, :]
            a = a[:, oy:oy + crop, ox:ox + crop]
            out["image_id"].append(ids[i])
            out["flip_h"].append(fh)
            out["flip_v"].append(fv)
            out["oy"].append(oy)
            out["ox"].append(ox)
            out["n_px"].append(int(a.size))
            out["aug_checksum"].append(weighted_checksum(a))
            out["caption"].append(caps[i])
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "flip_h": pa.array(out["flip_h"], pa.int64()),
            "flip_v": pa.array(out["flip_v"], pa.int64()),
            "oy": pa.array(out["oy"], pa.int64()),
            "ox": pa.array(out["ox"], pa.int64()),
            "n_px": pa.array(out["n_px"], pa.int64()),
            "aug_checksum": pa.array(out["aug_checksum"], pa.int64()),
            "caption": pa.array(out["caption"], pa.string())})

    return images.map_batches(fn, batch_format="pyarrow", batch_size=32)

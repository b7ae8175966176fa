"""Self-contained image codecs for the images-table ``bytes`` payload.

The reference reads rasters through GDAL (``utils.py:45-63``); in this
engine images travel as encoded binary cells of an Arrow table and are
decoded inside ``map_batches``. No imaging libraries exist in the target
environment, so the codecs are pure numpy + stdlib zlib:

- ``raw``  : C-order little-endian int16, bands plane-interleaved (p, m, n).
- ``zraw`` : zlib(deflate)-compressed ``raw`` — the lossless compressed path
             (same wire idea as PNG's deflate).
- ``q8``   : lossy per-band 8-bit linear quantization with exact min
             preservation — the lossy path; reconstruction satisfies the
             PSNR >= 40 dB per-row invariant (BASELINE.json input_hint) for
             int16 reflectance ranges.
- ``tiff`` : minimal uncompressed, planar-configuration, single-strip-per-
             band little-endian TIFF (the reference's fixtures are
             uncompressed striped GeoTIFFs; geo tags live in the table's
             ``gt``/``crs`` columns instead of the file).

All decoders return a C-contiguous ``(bands, h, w)`` int16 array.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "zraw", "q8", "tiff")
LOSSLESS = ("raw", "zraw", "tiff")


# ---------------------------------------------------------------------------
# raw / zraw

def _encode_raw(arr):
    return np.ascontiguousarray(arr, dtype="<i2").tobytes()


def _decode_raw(buf, w, h):
    a = np.frombuffer(buf, dtype="<i2")
    bands = a.size // (w * h)
    if bands * w * h != a.size:
        raise ValueError("raw payload size does not match w*h")
    return a.reshape((bands, h, w)).astype(np.int16, copy=True)


# ---------------------------------------------------------------------------
# q8 (lossy)

_Q8_MAGIC = b"Q8v1"


def _encode_q8(arr):
    arr = np.asarray(arr, dtype=np.int16)
    p, h, w = arr.shape
    out = [_Q8_MAGIC, struct.pack("<H", p)]
    payload = np.empty((p, h, w), dtype=np.uint8)
    for b in range(p):
        band = arr[b].astype(np.float32)
        lo = float(band.min())
        hi = float(band.max())
        scale = (hi - lo) / 255.0 if hi > lo else 1.0
        q = np.rint((band - lo) / scale).astype(np.uint8)
        payload[b] = q
        out.append(struct.pack("<ff", lo, scale))
    out.append(payload.tobytes())
    return b"".join(out)


def _decode_q8(buf, w, h):
    if buf[:4] != _Q8_MAGIC:
        raise ValueError("bad q8 magic")
    (p,) = struct.unpack_from("<H", buf, 4)
    offs = 6
    los = np.empty(p, dtype=np.float32)
    scales = np.empty(p, dtype=np.float32)
    for b in range(p):
        los[b], scales[b] = struct.unpack_from("<ff", buf, offs)
        offs += 8
    q = np.frombuffer(buf, dtype=np.uint8, offset=offs).reshape((p, h, w))
    rec = np.rint(
        q.astype(np.float32) * scales[:, None, None] + los[:, None, None])
    return rec.astype(np.int16)


# ---------------------------------------------------------------------------
# minimal TIFF (uncompressed, planar, little-endian, int16)

_TIFF_TAGS = {
    "ImageWidth": 256,
    "ImageLength": 257,
    "BitsPerSample": 258,
    "Compression": 259,
    "Photometric": 262,
    "StripOffsets": 273,
    "SamplesPerPixel": 277,
    "RowsPerStrip": 278,
    "StripByteCounts": 279,
    "PlanarConfig": 284,
    "SampleFormat": 339,
}


def _encode_tiff(arr):
    arr = np.ascontiguousarray(arr, dtype="<i2")
    p, h, w = arr.shape
    strip_size = h * w * 2
    n_tags = 11
    # Layout: 8-byte header | IFD | out-of-line arrays | strips
    ifd_offset = 8
    ifd_size = 2 + n_tags * 12 + 4
    # Out-of-line arrays: BitsPerSample (p SHORTs, if p > 2), StripOffsets
    # (p LONGs, if p > 1), StripByteCounts (p LONGs, if p > 1), SampleFormat
    # (p SHORTs, if p > 2).
    extra = ifd_offset + ifd_size
    def reserve(nbytes):
        nonlocal extra
        off = extra
        extra += nbytes
        return off
    bps_off = reserve(2 * p) if p > 2 else None
    sf_off = reserve(2 * p) if p > 2 else None
    so_off = reserve(4 * p) if p > 1 else None
    sbc_off = reserve(4 * p) if p > 1 else None
    data_off = extra
    strip_offsets = [data_off + i * strip_size for i in range(p)]

    def entry(tag, typ, count, value):
        return struct.pack("<HHI4s", tag, typ, count, value)

    def short_val(v):
        return struct.pack("<HH", v, 0)

    def long_val(v):
        return struct.pack("<I", v)

    entries = []
    T = _TIFF_TAGS
    entries.append(entry(T["ImageWidth"], 3, 1, short_val(w)))
    entries.append(entry(T["ImageLength"], 3, 1, short_val(h)))
    if p > 2:
        entries.append(entry(T["BitsPerSample"], 3, p, long_val(bps_off)))
    elif p == 2:
        entries.append(entry(T["BitsPerSample"], 3, 2, struct.pack("<HH", 16, 16)))
    else:
        entries.append(entry(T["BitsPerSample"], 3, 1, short_val(16)))
    entries.append(entry(T["Compression"], 3, 1, short_val(1)))
    entries.append(entry(T["Photometric"], 3, 1, short_val(1)))
    if p > 1:
        entries.append(entry(T["StripOffsets"], 4, p, long_val(so_off)))
    else:
        entries.append(entry(T["StripOffsets"], 4, 1, long_val(strip_offsets[0])))
    entries.append(entry(T["SamplesPerPixel"], 3, 1, short_val(p)))
    entries.append(entry(T["RowsPerStrip"], 3, 1, short_val(h)))
    if p > 1:
        entries.append(entry(T["StripByteCounts"], 4, p, long_val(sbc_off)))
    else:
        entries.append(entry(T["StripByteCounts"], 4, 1, long_val(strip_size)))
    entries.append(entry(T["PlanarConfig"], 3, 1, short_val(2)))
    if p > 2:
        entries.append(entry(T["SampleFormat"], 3, p, long_val(sf_off)))
    elif p == 2:
        entries.append(entry(T["SampleFormat"], 3, 2, struct.pack("<HH", 2, 2)))
    else:
        entries.append(entry(T["SampleFormat"], 3, 1, short_val(2)))
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])

    buf = bytearray()
    buf += struct.pack("<2sHI", b"II", 42, ifd_offset)
    buf += struct.pack("<H", len(entries))
    for e in entries:
        buf += e
    buf += struct.pack("<I", 0)  # next IFD
    if p > 2:
        assert len(buf) == bps_off
        buf += struct.pack("<%dH" % p, *([16] * p))
        assert len(buf) == sf_off
        buf += struct.pack("<%dH" % p, *([2] * p))
    if p > 1:
        assert len(buf) == so_off
        buf += struct.pack("<%dI" % p, *strip_offsets)
        assert len(buf) == sbc_off
        buf += struct.pack("<%dI" % p, *([strip_size] * p))
    assert len(buf) == data_off
    buf += arr.tobytes()
    return bytes(buf)


def _read_ifd_value(buf, typ, count, raw):
    sizes = {3: 2, 4: 4}
    fmt = {3: "H", 4: "I"}[typ]
    total = sizes[typ] * count
    if total <= 4:
        return list(struct.unpack_from("<%d%s" % (count, fmt), raw, 0))
    (off,) = struct.unpack("<I", raw)
    return list(struct.unpack_from("<%d%s" % (count, fmt), buf, off))


def _decode_tiff(buf, w=None, h=None):
    order, magic, ifd_offset = struct.unpack_from("<2sHI", buf, 0)
    if order != b"II" or magic != 42:
        raise ValueError("unsupported TIFF byte order / magic")
    (n_tags,) = struct.unpack_from("<H", buf, ifd_offset)
    tags = {}
    for i in range(n_tags):
        tag, typ, count = struct.unpack_from(
            "<HHI", buf, ifd_offset + 2 + i * 12)
        raw = buf[ifd_offset + 2 + i * 12 + 8: ifd_offset + 2 + i * 12 + 12]
        if typ in (3, 4):
            tags[tag] = _read_ifd_value(buf, typ, count, raw)
    T = _TIFF_TAGS
    width = tags[T["ImageWidth"]][0]
    height = tags[T["ImageLength"]][0]
    if tags.get(T["Compression"], [1])[0] != 1:
        raise ValueError("only uncompressed TIFF supported")
    p = tags.get(T["SamplesPerPixel"], [1])[0]
    offsets = tags[T["StripOffsets"]]
    counts = tags[T["StripByteCounts"]]
    out = np.empty((p, height, width), dtype=np.int16)
    for b in range(p):
        a = np.frombuffer(buf, dtype="<i2", count=counts[b] // 2,
                          offset=offsets[b])
        out[b] = a.reshape((height, width))
    return out


# ---------------------------------------------------------------------------
# public API

def encode_image(arr, fmt):
    """Encode a (bands, h, w) int16 array to bytes in ``fmt``."""
    arr = np.asarray(arr, dtype=np.int16)
    if arr.ndim != 3:
        raise ValueError("expected (bands, h, w)")
    if fmt == "raw":
        return _encode_raw(arr)
    if fmt == "zraw":
        return zlib.compress(_encode_raw(arr), 6)
    if fmt == "q8":
        return _encode_q8(arr)
    if fmt == "tiff":
        return _encode_tiff(arr)
    raise ValueError("unknown fmt %r" % (fmt,))


def decode_image(buf, fmt, w, h):
    """Decode bytes in ``fmt`` to a (bands, h, w) int16 array."""
    if fmt == "raw":
        return _decode_raw(buf, w, h)
    if fmt == "zraw":
        return _decode_raw(zlib.decompress(buf), w, h)
    if fmt == "q8":
        return _decode_q8(buf, w, h)
    if fmt == "tiff":
        return _decode_tiff(buf, w, h)
    raise ValueError("unknown fmt %r" % (fmt,))


def psnr(original, reconstructed):
    """Peak signal-to-noise ratio in dB against the original's dynamic range.

    Implements the per-row decode invariant (PSNR >= 40 dB for lossy
    formats) from BASELINE.json's input_hint.
    """
    a = np.asarray(original, dtype=np.float64)
    b = np.asarray(reconstructed, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    peak = float(a.max() - a.min())
    if peak <= 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)

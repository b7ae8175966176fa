"""Minimal self-contained ESRI Shapefile (point) writer.

Reference analogue: ``AbstractExtractor.get_idx_as_shp``
(``/root/reference/unmixing/lsma.py:92-115``) writes the extracted
endmember pixel locations as a point shapefile through OGR. No OGR exists
in this environment, so the three-file format is emitted directly from
the published ESRI Shapefile Technical Description (July 1998 whitepaper)
and the dBASE III header layout:

- ``.shp``: 100-byte header (file code 9994 BE, shape type 1 LE, bbox)
  + per point a record header (number, content length in 16-bit words,
  both BE) and content (shape type 1 + x + y doubles, LE).
- ``.shx``: same header + per record (offset words BE, length words BE).
- ``.dbf``: dBASE III header, one numeric field ``ID``, one record per
  point ("deleted" flag space + 10-byte right-justified integer).

Deterministic byte output (no timestamps: the dBF update date is pinned)
so the writer is golden-testable.
"""

from __future__ import annotations

import struct

SHAPE_POINT = 1


def _shp_header(n_points, xmin, ymin, xmax, ymax, record_words):
    """100-byte .shp/.shx header. ``record_words`` = total record section
    length in 16-bit words."""
    h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    h += struct.pack(">i", 50 + record_words)
    h += struct.pack("<ii", 1000, SHAPE_POINT)
    h += struct.pack("<4d", xmin, ymin, xmax, ymax)
    h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)   # Z/M ranges unused
    return h


def write_point_shp(path_base, points):
    """Write ``points`` [(x, y), ...] as ``path_base``.shp/.shx/.dbf.
    Returns the three paths."""
    pts = [(float(x), float(y)) for x, y in points]
    n = len(pts)
    if n:
        xmin = min(p[0] for p in pts)
        ymin = min(p[1] for p in pts)
        xmax = max(p[0] for p in pts)
        ymax = max(p[1] for p in pts)
    else:
        xmin = ymin = xmax = ymax = 0.0
    content_words = 10                      # shape type + 2 doubles = 20 B
    rec_words = n * (4 + content_words)     # + 8-byte record header
    shp = bytearray(_shp_header(n, xmin, ymin, xmax, ymax, rec_words))
    shx = bytearray(_shp_header(n, xmin, ymin, xmax, ymax, 4 * n))
    offset = 50
    for i, (x, y) in enumerate(pts):
        shx += struct.pack(">ii", offset, content_words)
        shp += struct.pack(">ii", i + 1, content_words)
        shp += struct.pack("<idd", SHAPE_POINT, x, y)
        offset += 4 + content_words

    # dBASE III: header (32 B) + field descriptor (32 B) + terminator
    n_fields = 1
    header_len = 32 + 32 * n_fields + 1
    record_len = 1 + 10                     # deletion flag + ID field
    dbf = bytearray()
    dbf += struct.pack("<B3BIHH20x", 0x03, 95, 7, 26, n, header_len,
                       record_len)          # pinned date 1995-07-26
    dbf += struct.pack("<11sc4xBB14x", b"ID", b"N", 10, 0)
    dbf += b"\x0d"
    for i in range(n):
        dbf += b" " + ("%10d" % (i + 1)).encode()
    dbf += b"\x1a"

    paths = tuple(path_base + ext for ext in (".shp", ".shx", ".dbf"))
    for p, data in zip(paths, (shp, shx, dbf)):
        with open(p, "wb") as f:
            f.write(bytes(data))
    return paths


def read_point_shp(path_base):
    """Parse back a point shapefile written by :func:`write_point_shp`
    (used by tests; also a smoke-check that the layout is well-formed)."""
    with open(path_base + ".shp", "rb") as f:
        buf = f.read()
    code, = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError("bad shapefile code")
    version, shape_type = struct.unpack_from("<ii", buf, 28)
    if version != 1000 or shape_type != SHAPE_POINT:
        raise ValueError("not a point shapefile")
    pts = []
    off = 100
    while off < len(buf):
        _num, words = struct.unpack_from(">ii", buf, off)
        st, x, y = struct.unpack_from("<idd", buf, off + 8)
        if st != SHAPE_POINT:
            raise ValueError("unexpected shape type %d" % st)
        pts.append((x, y))
        off += 8 + 2 * words
    return pts

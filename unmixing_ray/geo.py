"""Affine geotransform math: the bit-for-bit coordinate contracts.

The two transforms here mirror the reference's ``pixel_to_xy``
(``/root/reference/unmixing/utils.py:890-937``, core math at 930-931) and
``xy_to_pixel`` (``utils.py:1104-1157``, core math at 1153-1155 including the
``int()`` truncation toward zero). They are named in the north star and must
match bit-for-bit, so the scalar formulas are reproduced exactly; everything
else (vectorization over numpy arrays, polygon generation without OGR) is new.

A geotransform ``gt`` is the 6-element GDAL affine:
``(x_origin, px_w, row_rot, y_origin, col_rot, px_h)`` where ``px_h`` is
negative for north-up rasters. The reference only ever uses the axis-aligned
terms (gt[1], gt[5]); we do the same.
"""

from __future__ import annotations

import json

import numpy as np

__all__ = [
    "pixel_to_xy",
    "xy_to_pixel",
    "pixel_to_xy_arrays",
    "xy_to_pixel_arrays",
    "tile_geotransform",
    "point_to_pixel_geometry",
    "pixel_to_geojson",
]


def pixel_to_xy(pixel_pairs, gt, dd=False, lon0=None):
    """Translate (px, py) pixel pairs to (x, y) map coordinates.

    Bit-for-bit with reference ``utils.py:930-931``:
    ``x = px * gt[1] + gt[0]; y = py * gt[5] + gt[3]``.
    ``dd=True`` reprojects the result to decimal degrees (lon, lat) like
    reference ``utils.py:913-937``, via the engine's self-contained
    transverse-Mercator inverse for the working UTM-like CRS (proj.py;
    ``lon0`` overrides the zone's central meridian).
    """
    out = []
    for point in pixel_pairs:
        x = point[0] * gt[1] + gt[0]
        y = point[1] * gt[5] + gt[3]
        out.append((x, y))
    if dd:
        from . import proj
        kw = {} if lon0 is None else {"lon0": lon0}
        out = [tuple(np.asarray(v).item() for v in
                     proj.projected_to_dd(x, y, **kw)) for x, y in out]
    return out


def xy_to_pixel(xy_pairs, gt, dd=False, lon0=None):
    """Translate (x, y) map coordinates to (px, py) pixel pairs.

    Bit-for-bit with reference ``utils.py:1153-1155``, including the
    ``int()`` truncation toward zero (NOT floor) of the fractional pixel.
    ``dd=True`` takes (lon, lat) decimal-degree input and forward-projects
    it into the working CRS first (reference ``utils.py:1129-1143``).
    """
    if dd:
        from . import proj
        kw = {} if lon0 is None else {"lon0": lon0}
        proj_pairs = []
        for lon, lat in xy_pairs:
            x, y = proj.dd_to_projected(lon, lat, **kw)
            proj_pairs.append((float(x), float(y)))
        xy_pairs = proj_pairs
    out = []
    for point in xy_pairs:
        x = (point[0] - gt[0]) / gt[1]
        y = (point[1] - gt[3]) / gt[5]
        out.append((int(x), int(y)))
    return out


def pixel_to_xy_arrays(px, py, gt):
    """Vectorized pixel→map transform for numpy arrays (same math)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return px * gt[1] + gt[0], py * gt[5] + gt[3]


def xy_to_pixel_arrays(x, y, gt):
    """Vectorized map→pixel transform; truncation toward zero like int()."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    px = (x - gt[0]) / gt[1]
    py = (y - gt[3]) / gt[5]
    # int() truncates toward zero; np.trunc matches for all signs.
    return np.trunc(px).astype(np.int64), np.trunc(py).astype(np.int64)


def tile_geotransform(gt, col_off, row_off):
    """Geotransform of a sub-window at pixel offset (col_off, row_off).

    Engine-new: the reference carries offsets separately
    (``utils.py:118-150`` array_to_raster xoff/yoff); tiles instead carry a
    fully-resolved gt so every tile is self-describing.
    """
    x0 = gt[0] + col_off * gt[1] + row_off * gt[2]
    y0 = gt[3] + col_off * gt[4] + row_off * gt[5]
    return (x0, gt[1], gt[2], y0, gt[4], gt[5])


def point_to_pixel_geometry(points, pixel_side_length=30):
    """Square pixel-extent polygons centered on points.

    Mirrors reference ``lsma.py:695-741`` (vertex order: top-left,
    top-right, bottom-right, bottom-left, top-left) without OGR: returns
    each polygon as a closed ring, a list of five (x, y) tuples.
    Reprojection (source/target EPSG) is out of scope.
    """
    polys = []
    for p in points:
        r = pixel_side_length / 2
        polys.append([
            (p[0] - r, p[1] + r),
            (p[0] + r, p[1] + r),
            (p[0] + r, p[1] - r),
            (p[0] - r, p[1] - r),
            (p[0] - r, p[1] + r),
        ])
    return polys


def ring_to_wkt(ring, precision=7):
    """Serialize a closed ring to a POLYGON WKT string (OGR_WKT_PRECISION
    analogue: reference test/tests.py:24 pins precision 7)."""
    fmt = "%%.%df %%.%df" % (precision, precision)
    coords = ",".join(fmt % (x, y) for x, y in ring)
    return "POLYGON ((%s))" % coords


def pixel_to_geojson(pixel_pairs, gt, indent=2):
    """Pixel pairs → GeoJSON GeometryCollection of Points.

    Mirrors reference ``utils.py:848-869`` but emits projected coordinates
    (no dd reprojection available).
    """
    coords = pixel_to_xy(pixel_pairs, gt)
    doc = {"type": "GeometryCollection", "geometries": []}
    for pair in coords:
        doc["geometries"].append({"type": "Point", "coordinates": pair})
    return json.dumps(doc, sort_keys=False, indent=indent)

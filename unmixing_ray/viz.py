"""Visualization-adjacent operators: distributed histograms / CDF,
eigenvalue scree, feature-space selection → KML export.

Reference: visualize.py — the interactive plotting itself is out of
engine scope, but its data operations are first-class:
- ``histogram``/``cumulative_freq`` (visualize.py:468-509): fixed-bin
  partial histograms per batch merged by sum — exactly mergeable.
- eigenvalue scree (visualize.py:265-277): distributed covariance →
  driver eigendecomposition (kernels/mnf.covariance_partials).
- ``FeatureSpace`` selection → KML (visualize.py:141-235, golden-file
  tested in the reference test/tests.py:551-570): a feature-space box
  query filters pixels; selected pixel locations serialize to KML
  placemarks (Point + bounding Polygon), deterministic output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .constants import NODATA


def histogram(tiles, band=0, bins=32, value_range=(0, 10000),
              nodata=NODATA, input_col="pixels"):
    """Distributed fixed-bin histogram of one band over all tiles.
    Returns (bin_edges, counts)."""
    edges = np.linspace(value_range[0], value_range[1], bins + 1)

    def partial(batch: pa.Table) -> pa.Table:
        from .stages.decode import tiles_to_ndarray
        arrays, uniform = tiles_to_ndarray(batch)
        counts = np.zeros(bins, dtype=np.int64)
        n = batch.num_rows
        for i in range(n):
            a = uniform[i] if uniform is not None else arrays[i]
            vals = a[band].ravel()
            vals = vals[vals != nodata]
            h, _ = np.histogram(vals, bins=edges)
            counts += h
        return pa.table({"counts": pa.array([counts.tolist()],
                                            pa.list_(pa.int64()))})

    rows = tiles.map_batches(partial, batch_format="pyarrow").take_all()
    total = np.zeros(bins, dtype=np.int64)
    for r in rows:
        total += np.asarray(r["counts"])
    return edges, total


def cumulative_freq(tiles, band=0, bins=32, value_range=(0, 10000),
                    nodata=NODATA):
    """Empirical CDF from the distributed histogram
    (visualize.py:468-492)."""
    edges, counts = histogram(tiles, band, bins, value_range, nodata)
    c = np.cumsum(counts)
    total = c[-1] if len(c) and c[-1] > 0 else 1
    return edges, c / total


def eigenvalue_scree(tiles, nodata=NODATA):
    """Distributed covariance → descending eigenvalues
    (visualize.py:265-277 analogue)."""
    from .kernels import mnf as mnf_k

    def partial(batch: pa.Table) -> pa.Table:
        from .stages.decode import tiles_to_ndarray
        arrays, uniform = tiles_to_ndarray(batch)
        mats = [uniform[i] for i in range(uniform.shape[0])] \
            if uniform is not None else arrays
        parts = [mnf_k.covariance_partials(a, nodata) for a in mats]
        merged = None
        for p in parts:
            if merged is None:
                merged = {k: np.array(v, dtype=np.float64)
                          for k, v in p.items()}
            else:
                for k in merged:
                    merged[k] = merged[k] + p[k]
        pdim = len(merged["s"])
        return pa.table({
            "n": pa.array([float(merged["n"])]),
            "s": pa.array([merged["s"].tolist()], pa.list_(pa.float64())),
            "ss": pa.array([merged["ss"].ravel().tolist()],
                           pa.list_(pa.float64())),
        })

    rows = tiles.map_batches(partial, batch_format="pyarrow").take_all()
    parts = []
    for r in rows:
        p = len(r["s"])
        parts.append({"n": r["n"], "s": np.asarray(r["s"]),
                      "ss": np.asarray(r["ss"]).reshape(p, p)})
    from .kernels.mnf import eigenvalues_from_partials
    return eigenvalues_from_partials(parts)


def feature_space_selection(tiles_mnf, band_x=0, band_y=1, box=None,
                            max_points=30, nodata=NODATA):
    """Feature-space box query → selected pixel map coordinates.

    box: (xmin, xmax, ymin, ymax) in feature space (MNF component
    values). Returns list of (map_x, map_y) for up to ``max_points``
    selected pixels, deterministic order (tile_id, pixel index)."""
    if box is None:
        raise ValueError("box required")
    bx0, bx1, by0, by1 = box

    def select(batch: pa.Table) -> pa.Table:
        from .stages.mnf import mnf_pixels_view
        arrays, uniform = mnf_pixels_view(batch)
        out = {"tile_id": [], "pixel": [], "mx": [], "my": []}
        for i in range(batch.num_rows):
            a = uniform[i] if uniform is not None else arrays[i]
            fx = a[band_x].ravel()
            fy = a[band_y].ravel()
            sel = np.nonzero((fx >= bx0) & (fx <= bx1)
                             & (fy >= by0) & (fy <= by1))[0]
            if not len(sel):
                continue
            gt = tuple(batch["gt"][i].as_py())
            w = batch["w"][i].as_py()
            py, px = np.divmod(sel, w)
            mxs, mys = px * gt[1] + gt[0], py * gt[5] + gt[3]
            tid = batch["tile_id"][i].as_py()
            out["tile_id"].extend([tid] * len(sel))
            out["pixel"].extend(sel.tolist())
            out["mx"].extend(mxs.tolist())
            out["my"].extend(mys.tolist())
        return pa.table({k: pa.array(v) for k, v in out.items()})

    rows = tiles_mnf.map_batches(select, batch_format="pyarrow")\
        .take_all()
    rows.sort(key=lambda r: (r["tile_id"], r["pixel"]))
    return [(r["mx"], r["my"]) for r in rows[:max_points]]


def selection_to_kml(coords, name="Selection"):
    """Serialize selected coordinates to KML: one Point placemark per
    coordinate plus a bounding-box Polygon placemark (the reference's
    FeatureSpace.on_draw export shape, visualize.py:150-235).
    Deterministic byte output for golden-file testing."""
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<kml xmlns="http://www.opengis.net/kml/2.2">',
             "<Folder><name>%s</name>" % name]
    for i, (x, y) in enumerate(coords):
        lines.append(
            "<Placemark><name>Point %d</name><Point><coordinates>"
            "%.7f,%.7f</coordinates></Point></Placemark>" % (i + 1, x, y))
    if coords:
        xs = [c[0] for c in coords]
        ys = [c[1] for c in coords]
        ring = [(min(xs), min(ys)), (max(xs), min(ys)),
                (max(xs), max(ys)), (min(xs), max(ys)),
                (min(xs), min(ys))]
        coord_str = " ".join("%.7f,%.7f" % (x, y) for x, y in ring)
        lines.append(
            "<Placemark><name>Extent</name><Polygon><outerBoundaryIs>"
            "<LinearRing><coordinates>%s</coordinates></LinearRing>"
            "</outerBoundaryIs></Polygon></Placemark>" % coord_str)
    lines.append("</Folder></kml>")
    return "\n".join(lines) + "\n"


def endmember_idx_to_kml(coords, wavelength_units="MNF Component"):
    """AbstractExtractor.get_idx_as_kml analogue (lsma.py:55-90):
    endmember locations → KML point placemarks."""
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<kml xmlns="http://www.opengis.net/kml/2.2">', "<Folder>"]
    for i, (x, y) in enumerate(coords):
        lines.append(
            "<Placemark><name>%s %d</name><Point><coordinates>"
            "%f,%f</coordinates></Point></Placemark>"
            % (wavelength_units, i + 1, x, y))
    lines.append("</Folder></kml>")
    return "\n".join(lines) + "\n"


def endmember_idx_to_shp(path_base, coords):
    """AbstractExtractor.get_idx_as_shp analogue (lsma.py:92-115):
    endmember pixel locations → point shapefile (.shp/.shx/.dbf),
    written with the engine's self-contained ESRI writer (no OGR)."""
    from .shapefile import write_point_shp
    return write_point_shp(path_base, coords)


def report_raster_dynamic_range(tiles, nodata=NODATA):
    """Per-band min/max/mean/std over all tiles (reference
    lsma.py:799-839) via mergeable partials; returns dict with
    per-band stats and the mean dynamic range."""

    def partial(batch: pa.Table) -> pa.Table:
        from .stages.decode import tiles_to_ndarray
        arrays, uniform = tiles_to_ndarray(batch)
        mats = [uniform[i] for i in range(uniform.shape[0])] \
            if uniform is not None else arrays
        p = mats[0].shape[0] if mats else 0
        mins = np.full(p, np.inf)
        maxs = np.full(p, -np.inf)
        s = np.zeros(p)
        ss = np.zeros(p)
        n = np.zeros(p)
        for a in mats:
            flat = a.reshape(a.shape[0], -1).astype(np.float64)
            valid = flat != nodata
            fv = np.where(valid, flat, np.nan)
            mins = np.fmin(mins, np.nanmin(fv, axis=1))
            maxs = np.fmax(maxs, np.nanmax(fv, axis=1))
            s += np.where(valid, flat, 0).sum(axis=1)
            ss += np.where(valid, flat * flat, 0).sum(axis=1)
            n += valid.sum(axis=1)
        return pa.table({
            "mins": pa.array([mins.tolist()], pa.list_(pa.float64())),
            "maxs": pa.array([maxs.tolist()], pa.list_(pa.float64())),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "ss": pa.array([ss.tolist()], pa.list_(pa.float64())),
            "n": pa.array([n.tolist()], pa.list_(pa.float64())),
        })

    rows = tiles.map_batches(partial, batch_format="pyarrow").take_all()
    mins = np.min([r["mins"] for r in rows], axis=0)
    maxs = np.max([r["maxs"] for r in rows], axis=0)
    s = np.sum([r["s"] for r in rows], axis=0)
    ss = np.sum([r["ss"] for r in rows], axis=0)
    n = np.sum([r["n"] for r in rows], axis=0)
    mean = s / np.maximum(n, 1)
    std = np.sqrt(np.maximum(ss / np.maximum(n, 1) - mean * mean, 0))
    dr = maxs - mins
    return {"min": mins, "max": maxs, "mean": mean, "std": std,
            "dynamic_range": dr, "mean_dynamic_range": float(dr.mean())}

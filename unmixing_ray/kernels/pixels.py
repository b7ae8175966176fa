"""Pixel-table kernels: ravel/filter/fill/normalize.

Reference semantics: lsma.py:760-796 (ravel / ravel_and_filter),
utils.py:1067-1101 (subarray), utils.py:617-654 (fill_*_bandwise),
lsma.py:658-692 (normalize_reflectance_within_image),
utils.py:1000-1033 (spectra gathers).
"""

from __future__ import annotations

import numpy as np

from ..constants import NODATA
from ..geo import xy_to_pixel


def ravel(arr):
    """(p, m, n) → ((m*n), p). Reference: lsma.py:760-766."""
    return ravel_and_filter(arr, filter=False)


def ravel_and_filter(arr, filter=True, nodata=NODATA):
    """(p, m, n) → ((m*n), p), optionally dropping rows whose FIRST band is
    NoData (reference filters on column 0: lsma.py:794)."""
    arr = np.asarray(arr)
    shp = arr.shape
    if len(shp) == 1 and filter:
        return arr[arr != nodata]
    if len(shp) == 2:
        out = arr.reshape(1, shp[-2] * shp[-1]).swapaxes(0, 1)
        if filter:
            return out[out != nodata]
        return out
    out = arr.reshape(shp[0], shp[1] * shp[2]).swapaxes(0, 1)
    if filter:
        return out[out[:, 0] != nodata]
    return out


def subarray(rast, filtered_value=NODATA, indices=False):
    """(p, m, n) → (p, z) keeping pixels where ANY band != filtered_value
    (reference: utils.py:1067-1101, `.any(axis=0)` at 1095)."""
    rastr = np.asarray(rast)
    shp = rastr.shape
    if len(shp) == 1:
        return rastr[rastr != filtered_value]
    if len(shp) == 2 or shp[0] == 1:
        arr = rastr.reshape(1, shp[-2] * shp[-1])
        return arr[arr != filtered_value]
    arr = rastr.reshape(shp[0], shp[1] * shp[2])
    idx = (arr != filtered_value).any(axis=0)
    if indices:
        rast_shp = (shp[-2], shp[-1])
        return (np.indices(rast_shp)[:, idx.reshape(rast_shp)], arr[:, idx])
    return arr[:, idx]


def fill_nodata_bandwise(arr, fill_values=None, nodata=NODATA):
    """NoData → NaN → fill_nan_bandwise. Reference: utils.py:617-626."""
    arr2 = np.where(np.asarray(arr) == nodata, np.nan, arr)
    return fill_nan_bandwise(arr2, fill_values=fill_values)


def fill_nan_bandwise(arr, fill_values=None):
    """Fill NaNs with per-band means (or a given vector).
    Reference: utils.py:629-654."""
    arr = np.asarray(arr, dtype=np.float64)
    shp = arr.shape
    arr2 = arr.copy()
    if arr.ndim > 2:
        arr2 = arr.reshape((shp[0], shp[1] * shp[2]))
    if fill_values is not None:
        if len(fill_values) != shp[0]:
            raise ValueError("fill_values length must equal band count")
        fill_values = np.asarray(fill_values, dtype=np.float64)
    else:
        fill_values = np.nanmean(arr2, axis=1)
    idx = np.where(np.isnan(arr2))
    arr2[idx] = np.take(fill_values, idx[0])
    return arr2.reshape(shp)


def band_nan_partials(arr, nodata=NODATA):
    """Per-tile partial (sum, count) of valid values per band, for the
    distributed image-global band-mean fill (the AGG half of
    fill_nodata_bandwise when means must be global)."""
    arr = np.asarray(arr, dtype=np.float64)
    flat = arr.reshape(arr.shape[0], -1)
    valid = flat != nodata
    sums = np.where(valid, flat, 0.0).sum(axis=1)
    counts = valid.sum(axis=1)
    return sums, counts


def normalize_reflectance_within_image(rast, band_range=(0, 5),
                                       nodata=NODATA, scale=100):
    """Wu (2004) normalization: divide each pixel by its across-band mean
    over ``band_range``, optionally × scale; NoData passthrough.
    Reference: lsma.py:658-692."""
    rastr = np.array(rast, copy=True).astype(np.float64)
    shp = rastr.shape
    b0, b1 = band_range
    b1 += 1
    means = rastr[b0:b1, ...].mean(axis=0)
    out = rastr / means.reshape((1,) + shp[1:])
    if scale is not None:
        out = out * scale
    np.place(out, np.asarray(rast) == nodata, nodata)
    return out


def spectra_at_idx(hsi_cube, idx):
    """Gather spectra at pixel indices from an HSI (n, m, p) cube.
    Reference: utils.py:1000-1009."""
    return np.array([hsi_cube[p[0], p[1], :] for p in idx])


def spectra_at_xy(rast, xy, gt, nodata=NODATA):
    """Gather spectra at map coordinates: xy → pixel via the bit-exact
    transform, then fancy-index the transposed raster.
    Reference: utils.py:1012-1033."""
    rast = np.asarray(rast)
    return spectra_at_idx(rast.transpose(), xy_to_pixel(xy, gt))

"""Multi-date composite kernels.

Reference semantics: ``composite`` (utils.py:343-389, single band,
nan-reducers), ``composite2`` (utils.py:392-451, masked arrays + optional
sum-normalization) and ``composite3`` (utils.py:454-525, star-reducers).
``composite2`` and ``composite3`` are pinned equivalent-output in the
reference's tests (test/tests.py:179-222), so the engine implements ONE
vectorized kernel with composite3's semantics (NoData stripped for
median/starred reducers; plain min/max/mean include NoData arithmetic;
None drops the band; normalize divides by the across-band sum unless the
pixel is all-NoData) and exposes all three names.

In the distributed engine these kernels run inside
``groupby(cell).map_groups`` over (cell, date) tile rows.
"""

from __future__ import annotations

import warnings

import numpy as np

from ..constants import NODATA


def composite(*rasters, target_band=1, reducer="median", nodata=NODATA,
              dtype=np.float32):
    """Single-band nan-reduce across dates. Reference: utils.py:343-389.
    (The reference's ProcessPoolExecutor partitioning is replaced by the
    engine's groupby; output is identical for these commutative reducers.)
    """
    if reducer not in ("median", "min", "max", "mean"):
        raise ValueError("Invalid reducer name")
    shp = rasters[0].shape
    for r in rasters:
        if r.shape != shp:
            raise ValueError("Rasters must have the same shape")
    if rasters[0].ndim < 3:
        shp = (1,) + shp
        rasters = [r.reshape(shp) for r in rasters]
    b = target_band
    stack = np.stack([r[b, ...] for r in rasters]).astype(np.float64)
    stack = np.where(stack == nodata, np.nan, stack)
    func = getattr(np, "nan%s" % reducer)
    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        result = func(stack, axis=0)
    result = result.reshape((1, shp[1], shp[2]))
    return np.where(np.isnan(result), nodata, result).astype(dtype)


def _reduce_band(stack, reducer, nodata, dtype):
    """stack: (dates, m, n) for one band; returns (m, n)."""
    if reducer in ("min", "max", "mean"):
        # plain reducers include the NoData value in arithmetic
        # (reference composite3 fast path, utils.py:496-498)
        return getattr(stack, reducer)(axis=0)
    name = reducer.strip("*")
    work = np.where(stack == nodata, np.nan, stack.astype(np.float64))
    all_nodata = np.isnan(work).all(axis=0)
    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        out = getattr(np, "nan%s" % name)(work, axis=0)
    return np.where(all_nodata, dtype(nodata), out)


def composite3(reducers, *rasters, normalize="sum", nodata=NODATA,
               dtype=np.float32):
    """Per-band reducer list composite. Reference: utils.py:454-525.

    reducers: per band, one of 'min'/'max'/'mean' (NoData participates),
    'min*'/'max*'/'mean*'/'median' (NoData stripped; all-NoData → NoData),
    or None (drop band). ``normalize='sum'`` divides each surviving band by
    the across-band sum per pixel unless the pixel is all-NoData.
    """
    shp = rasters[0].shape
    for r in rasters:
        if r.shape != shp:
            raise ValueError("Rasters must have the same shape")
    if len(shp) < 3:
        shp = (1,) + shp
        rasters = [r.reshape(shp) for r in rasters]
    if not (len(reducers) == shp[0] or len(reducers) == len(shp) - 1):
        raise ValueError("Must provide a reducer for each band")
    band_arrays = []
    for i in range(shp[0]):
        if reducers[i] is None:
            continue
        stack = np.stack([r[i, ...] for r in rasters])
        band_arrays.append(_reduce_band(stack, reducers[i], nodata, dtype))
    num = len(band_arrays)
    final = np.stack(band_arrays).reshape((num, shp[-2], shp[-1]))
    if normalize is not None:
        flat = final.reshape((num, -1)).astype(np.float64)
        all_nodata = (flat == nodata).all(axis=0)
        norm = getattr(flat, normalize)(axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = flat / norm
        out[:, all_nodata] = dtype(nodata)
        return out.reshape(final.shape)
    return final


def composite2(reducers, *rasters, normalize="sum", nodata=NODATA,
               dtype=np.float32):
    """Masked-array variant; equivalent output to composite3 per the
    reference's own pinned tests (utils.py:392-451; test/tests.py:179-222).
    NOTE: composite2 semantics differ from composite3 in that its
    min/max/mean EXCLUDE NoData (masked); map plain names to starred.
    """
    mapped = []
    for r in reducers:
        if r in ("min", "max", "mean"):
            mapped.append(r + "*")
        else:
            mapped.append(r)
    return composite3(mapped, *rasters, normalize=normalize, nodata=nodata,
                      dtype=dtype)

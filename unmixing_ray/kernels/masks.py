"""Mask kernels: pure-numpy re-expressions of the reference's mask suite.

Each function operates on a dense ``(bands, m, n)`` raster array (one tile's
payload inside ``map_batches``) and preserves the reference's NoData
sentinel semantics exactly. Reference citations per function below; these
are the "binary-mask and density-slice fixtures" named in the north star.
"""

from __future__ import annotations

import numpy as np

from ..constants import NODATA, SATURATION_VALUE


def binary_mask(rast, mask, nodata=NODATA, invert=False):
    """Apply a {0,1} mask: pixels where mask==1 (or ==0 when ``invert``)
    become NoData across all bands. Reference: utils.py:184-227."""
    rastr = np.array(rast, copy=True)
    maskr = np.asarray(mask)
    if not np.array_equal(rastr.shape[-2:], maskr.shape[-2:]):
        raise ValueError("Raster and mask do not have the same shape")
    if maskr.dtype == bool:
        maskr = maskr.astype(np.int8)
    if maskr.shape != rastr.shape:
        maskr = maskr.reshape((1,) + maskr.shape[-2:])\
            .repeat(rastr.shape[0], axis=0)
    if invert:
        rastr[maskr < 1] = nodata
    else:
        rastr[maskr > 0] = nodata
    return rastr


def clean_mask(rast):
    """Clip mask values to [0, 1]. Reference: utils.py:266-280."""
    return np.clip(np.asarray(rast), 0, 1)


def cfmask(mask, mask_values=(1, 2, 3, 4, 255), nodata=NODATA):
    """QA raster → {0,1} mask by value-set membership (1 = to be masked).
    Reference: utils.py:230-263; value tables from eos.py:8-23."""
    maskr = np.asarray(mask)
    if maskr.ndim == 3:
        maskr = maskr[0]
    out = np.isin(maskr, np.asarray(mask_values))
    return out.reshape((1,) + maskr.shape).astype(np.int8)


def saturation_mask(rast, saturation_value=SATURATION_VALUE, nodata=NODATA):
    """True where any band exceeds ``saturation_value``.
    Reference: utils.py:971-997 (returns float {0,1} like the original's
    np.empty+logical_or accumulation; we return bool for clarity but the
    values are identical under comparison)."""
    rastr = np.asarray(rast)
    return (rastr > saturation_value).any(axis=0, keepdims=True)


def density_slice(rast, rel=np.less_equal, threshold=1000, nodata=NODATA):
    """Single-band threshold predicate, NoData-excluded, → {0,1} int mask.
    Reference: utils.py:560-579 (a named north-star fixture op)."""
    rastr = np.asarray(rast)
    if rastr.ndim > 2 and min(rastr.shape) > 1:
        raise ValueError("Expected a single-band raster array")
    return np.logical_and(
        rel(rastr, threshold),
        np.not_equal(rastr, nodata)).astype(np.int8)


def mask_by_query(rast, query, invert=False, nodata=NODATA):
    """Mask pixels matching a boolean query array (broadcast across bands
    when 2-D). Reference: utils.py:757-793."""
    rastr = np.array(rast, copy=True)
    query = np.asarray(query)
    shp = rastr.shape
    if query.shape != rastr.shape:
        if not (query.ndim == 2 or query.ndim == len(shp)):
            raise ValueError("Query must be 2-D or match raster rank")
        if shp[-2:] != query.shape[-2:]:
            raise ValueError("Raster and query must share extent")
        query = query.reshape((1,) + shp[-2:]).repeat(shp[0], axis=0)
    if invert:
        rastr[~query] = nodata
    else:
        rastr[query] = nodata
    return rastr


def copy_nodata(source, target, nodata=NODATA):
    """Embed source's NoData footprint into target (band 0 of source defines
    the footprint for multiband). Reference: utils.py:528-557."""
    source = np.asarray(source)
    target = np.asarray(target)
    if source.ndim != target.ndim:
        raise ValueError("Source and target must have the same rank")
    if source.ndim == 3:
        if source.shape[1:] != target.shape[1:]:
            raise ValueError("Source and target must share extent")
        return np.where(source[0, ...] == nodata, nodata, target)
    if source.shape != target.shape:
        raise ValueError("Source and target must share shape")
    return np.where(source == nodata, nodata, target)


def combine_masks(*masks, multiply=False):
    """n-ary combine: greedy OR (any 1 → 1) or conservative AND-by-multiply
    (any 0 → 0). Reference: utils.py:309-340."""
    for m in masks:
        if not isinstance(m, np.ndarray):
            raise TypeError("Expected a numpy.ndarray type")
    stack = np.stack(masks)
    if multiply:
        return np.prod(stack, axis=0)
    base = np.zeros(masks[0].shape, dtype=stack.dtype)
    for m in masks:
        base = np.where(m > 0, m, base)
    return base


def mask_ledaps_qa_apply(rast, mask, mode, nodata=NODATA):
    """Apply the LEDAPS-QA modal-value rule given the globally computed
    ``mode`` (the distributed two-pass computes the mode via a groupby
    count; this kernel applies it per tile). Reference: utils.py:796-845
    (mode at 835, mask application at 837-845)."""
    if not (mode > 4 and mode < 12287):
        raise ValueError("The modal value corresponds to a known error value")
    rastr = np.array(rast, copy=True)
    maskr = np.array(mask, copy=True)
    if maskr.ndim == 3:
        maskr = maskr[0]
    keep = maskr == mode
    maskr = keep.astype(maskr.dtype)
    maskr = maskr.reshape((1,) + maskr.shape).repeat(rastr.shape[0], axis=0)
    rastr[maskr == 0] = nodata
    return rastr


def qa_value_counts(mask):
    """Per-tile partial counts of QA values for the distributed global-mode
    pass (bincount analogue of utils.py:835)."""
    maskr = np.asarray(mask).ravel()
    vals, counts = np.unique(maskr, return_counts=True)
    return vals.astype(np.int64), counts.astype(np.int64)


def as_mask(rast, nodata=NODATA):
    """Binarize: non-zero in any band → 1, then clear NoData → 0.
    Reference: utils.py:66-103 (the file-open part is the reader facade)."""
    rastr = np.array(rast, copy=True)
    if rastr.ndim == 2:
        rastr = rastr.reshape((1,) + rastr.shape)
    if rastr.ndim != 3:
        raise ValueError("Number of array dimensions must be 2 or 3")
    any_pos = (rastr > 0).any(axis=0)
    rastr[:, any_pos] = 1
    rastr[rastr == nodata] = 0
    return rastr

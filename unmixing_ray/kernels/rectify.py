"""Radiometric rectification after Hall et al. (1991).

Reference: lsma.py:523-584. Split into coefficient estimation (from
bright/dark radiometric control-set means — a tiny broadcast-side gather)
and per-tile application, so the engine can gather control spectra with a
broadcast join and apply the affine per tile.
"""

from __future__ import annotations

import numpy as np

from ..constants import NODATA
from .pixels import spectra_at_xy


def control_set_means(rast, gt, control_set,
                      keys=("High/Bright", "Low/Dark"), nodata=NODATA):
    """Mean spectra of bright/dark control sets, NoData rows filtered on
    band 0 (reference lsma.py:549-552)."""
    brights = spectra_at_xy(rast, control_set[keys[0]], gt)
    bright = brights[brights[:, 0] != nodata].mean(axis=0)
    darks = spectra_at_xy(rast, control_set[keys[1]], gt)
    dark = darks[darks[:, 0] != nodata].mean(axis=0)
    return bright, dark


def rectification_coefficients(bright_ref, dark_ref, bright_sub, dark_sub):
    """Per-band linear gain/offset (m, b). Reference lsma.py:568-569."""
    m = (bright_ref - dark_ref) / (bright_sub - dark_sub)
    b = (dark_ref * bright_sub - dark_sub * bright_ref) \
        / (bright_sub - dark_sub)
    return m, b


def apply_rectification(arr, m, b, nodata=NODATA, dtype=np.int32):
    """Apply gain/offset per band, re-embedding NoData.
    Reference lsma.py:571-577."""
    arr = np.asarray(arr)
    shp = arr.shape
    flat = arr.reshape((shp[0], -1)).astype(np.float64)
    out = flat * m.reshape((-1, 1)) + b.reshape((-1, 1))
    out = out.reshape(shp)
    # clip to the dtype range before casting: out-of-range float->int
    # casts are undefined behavior (NoData x large gain overflows int32)
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        out = np.clip(out, float(info.min), float(info.max))
    out = out.astype(dtype)
    out[arr == nodata] = nodata
    return out


def hall_rectification(reference, subject, gt_ref, gt_sub, ref_set, sub_set,
                       keys=("High/Bright", "Low/Dark"), nodata=NODATA,
                       dtype=np.int32):
    """End-to-end single-array convenience matching the reference flow."""
    bright_ref, dark_ref = control_set_means(
        reference, gt_ref, ref_set, keys, nodata)
    bright_sub, dark_sub = control_set_means(
        subject, gt_sub, sub_set, keys, nodata)
    m, b = rectification_coefficients(
        bright_ref, dark_ref, bright_sub, dark_sub)
    return apply_rectification(subject, m, b, nodata, dtype)

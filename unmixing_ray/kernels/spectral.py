"""Spectral-math kernels: Tasseled Cap, indices, error metrics, abundance
algebra. Reference: transform.py (TC/NDVI/BCI/RNDSI), utils.py:734-754/
940-968 (mae/rmse), lsma.py:300-330/744-757/842-855 (abundance algebra).

Global-statistics ops (BCI, RNDSI) are split fit/apply: the engine computes
the global per-band min/max with a distributed aggregate and these kernels
take the precomputed stats, matching the reference's whole-image semantics
(transform.py:67-69, 253-259) without materializing the image.
"""

from __future__ import annotations

import numpy as np

from ..constants import NODATA

# Coefficient tables transcribed from the published papers the reference
# cites (Crist 1985 Table 1; Crist et al. 1986 via Liu 2015; Baig et al.
# 2014 Table 2; Liu et al. 2016 Table 2) — transform.py:121-217.
TC_TM_REFLECTANCE = np.array([
    (0.2043, 0.4158, 0.5524, 0.5741, 0.3124, 0.2303),
    (-0.1603, -0.2819, -0.4934, 0.7940, -0.0002, -0.1446),
    (0.0315, 0.2021, 0.3102, 0.1594, -0.6806, -0.6109),
    (-0.2117, -0.0284, 0.1302, -0.1007, 0.6529, -0.7078),
    (-0.8669, -0.1835, 0.3856, 0.0408, -0.1132, 0.2272),
    (0.3677, -0.8200, 0.4354, 0.0518, -0.0066, -0.0104),
], dtype=np.float32)

TC_TM_DN = np.array([
    (0.2909, 0.2493, 0.4806, 0.5568, 0.4438, 0.1706),
    (-0.2728, -0.2174, -0.5508, 0.7220, 0.0733, -0.1648),
    (0.1446, 0.1761, 0.3322, 0.3396, -0.6210, 0.4186),
])

TC_OLI = np.array([
    (0.3029, 0.2786, 0.4733, 0.5599, 0.5080, 0.1872),
    (-0.2941, -0.2430, -0.5424, 0.7276, 0.0713, -0.1608),
    (0.1511, 0.1973, 0.3283, 0.3407, -0.7117, -0.4559),
    (-0.8239, 0.0849, 0.4396, -0.0580, 0.2013, -0.2773),
    (-0.3294, 0.0557, 0.1056, 0.1855, -0.4349, 0.8085),
    (0.1079, -0.9023, 0.4119, 0.0575, -0.0259, 0.0252),
], dtype=np.float32)

TC_ETM_PLUS_TOA = np.array([
    (0.3561, 0.3972, 0.3904, 0.6966, 0.2286, 0.1596),
    (-0.3344, -0.3544, -0.4556, 0.6966, -0.0242, -0.2630),
    (0.2626, 0.2141, 0.0926, 0.0656, -0.7629, -0.5388),
], dtype=np.float32)

TC_ETM_PLUS_DN = np.array([
    (0.3627, 0.4005, 0.5216, 0.2600, 0.4279, 0.4304),
    (-0.0997, 0.0074, -0.1985, 0.9230, 0.0673, -0.3068),
    (0.4217, 0.3581, 0.3210, -0.0024, -0.6037, -0.4759),
], dtype=np.float32)


def tasseled_cap(rast, rt, offset=False, ncomp=3):
    """Fixed linear projection rt·X (+ optional per-band |min| offset).
    Reference: transform.py:17-43."""
    rast = np.asarray(rast)
    shp = rast.shape
    shp2 = shp if shp[0] == rt.shape[0] else (rt.shape[0],) + shp[1:]
    x = rast.reshape(shp[0], shp[1] * shp[2])
    out = np.dot(rt, x).reshape(shp2)
    if offset:
        f = np.empty(shp2)
        for b in range(shp2[0]):
            f[b, ...] = abs(out[b, ...].min())
        out = out + f
    return out[0:ncomp, ...]


def tasseled_cap_tm(rast, reflectance=True, offset=False, nodata=NODATA,
                    ncomp=3):
    rt = TC_TM_REFLECTANCE if reflectance else TC_TM_DN
    return tasseled_cap(rast, rt, offset, ncomp)


def tasseled_cap_oli(rast, offset=False, nodata=NODATA, ncomp=3):
    return tasseled_cap(rast, TC_OLI, offset, ncomp)


def tasseled_cap_etm_plus(rast, toa=True, offset=False, nodata=NODATA,
                          ncomp=3):
    rt = TC_ETM_PLUS_TOA if toa else TC_ETM_PLUS_DN
    return tasseled_cap(rast, rt, offset, ncomp)


def ndvi(rast, red_idx=2, nir_idx=3, nodata=NODATA):
    """(NIR−Red)/(NIR+Red); NoData where BOTH bands are NoData (matching
    the reference's logical_and — transform.py:96-101)."""
    rastr = np.asarray(rast, dtype=np.float64)
    shp = rastr.shape
    with np.errstate(divide="ignore", invalid="ignore"):
        nd = np.divide(rastr[nir_idx] - rastr[red_idx],
                       rastr[nir_idx] + rastr[red_idx])
    out = np.where(
        np.logical_and(rastr[nir_idx] == nodata, rastr[red_idx] == nodata),
        nodata, nd)
    return out.reshape((1, shp[1], shp[2]))


def bci_band_stats(rast, tc_func=tasseled_cap_tm, nodata=NODATA):
    """Partial stats for BCI: per-TC-component (min-excluding-NoData, max)
    for a tile; merged globally by the engine. Mirrors transform.py:67-69
    semantics: min excludes the NoData value, max does not."""
    x = tc_func(rast, ncomp=3).reshape(3, -1)
    mins = np.empty(3)
    maxs = np.empty(3)
    for i in range(3):
        vals = x[i][x[i] != nodata]
        mins[i] = vals.min() if vals.size else np.inf
        maxs[i] = x[i].max()
    return mins, maxs


def biophysical_composition_index(rast, tc_func=tasseled_cap_tm,
                                  nodata=NODATA, stats=None):
    """BCI of Deng & Wu (2012). ``stats=(mins, maxs)`` supplies the global
    per-component min/max; when None they are computed from this array
    alone (single-image semantics = reference transform.py:46-77)."""
    rast = np.asarray(rast)
    shp = rast.shape
    x = tc_func(rast, ncomp=3).reshape(3, shp[1] * shp[2])
    if stats is None:
        mins, maxs = bci_band_stats(rast, tc_func, nodata)
    else:
        mins, maxs = stats
    stack = []
    for i in range(3):
        # min-max normalize each TC component against the (global) stats;
        # reference math: (x - tcmin) / (x.max() - tcmin) at transform.py:68
        stack.append((x[i] - mins[i]) / (maxs[i] - mins[i]))
    h, v, l = stack
    with np.errstate(divide="ignore", invalid="ignore"):
        out = (((h + l) / 2.0) - v) / (((h + l) / 2.0) + v)
    return out.reshape((1, shp[1], shp[2]))


def rndsi_stats(rast, tc_func=tasseled_cap_tm, bands=(6, 2), nodata=NODATA):
    """Partial (nanmin, nanmax) of TC1 and NDSI for a tile (global pass of
    reference transform.py:251-259)."""
    arr = np.asarray(rast, dtype=np.float64)
    tc1 = tc_func(arr, ncomp=1)
    tc1 = np.where(arr[0, ...] == nodata, np.nan, tc1)
    b_swir2, b_green = (bands[0] - 1, bands[1] - 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        ndsi = (arr[b_swir2] - arr[b_green]) / (arr[b_swir2] + arr[b_green])
    ndsi = np.where(arr[0, ...] == nodata, np.nan, ndsi)
    return (np.nanmin(tc1), np.nanmax(tc1), np.nanmin(ndsi), np.nanmax(ndsi),
            tc1, ndsi)


def rndsi(rast, tc_func=tasseled_cap_tm, bands=(6, 2), nodata=NODATA,
          stats=None):
    """Ratio normalized-difference soil index, Deng et al. (2015).
    Reference: transform.py:220-262. ``stats=(tc1min, tc1max, ndsimin,
    ndsimax)`` supplies global extrema for the distributed two-pass."""
    arr = np.asarray(rast, dtype=np.float64)
    shp = arr.shape
    t0, t1, n0, n1, tc1, ndsi = rndsi_stats(arr, tc_func, bands, nodata)
    if stats is not None:
        t0, t1, n0, n1 = stats
    ndsi = ndsi.reshape((1, shp[1], shp[2]))
    with np.errstate(divide="ignore", invalid="ignore"):
        ntc1 = (tc1 - t0) / (t1 - t0)
        nndsi = (ndsi - n0) / (n1 - n0)
        out = nndsi / np.where(ntc1 == 0, np.nan, ntc1)
    return out


def mae(reference, predictions, idx=None, n=1):
    """Mean absolute error over bands for (p, z) pixel tables.
    Reference: utils.py:734-754."""
    reference = np.asarray(reference, dtype=np.float64)
    predictions = np.asarray(predictions, dtype=np.float64)
    if idx is None:
        residuals = reference - predictions
    else:
        residuals = reference[:, idx] - predictions[:, idx]
    return np.abs(residuals).sum(axis=0) / n


def rmse(reference, predictions, idx=None, n=1, nodata=NODATA):
    """Powell et al. (2007) RMSE over bands. Reference: utils.py:940-968
    (incl. the NoData strip of sample indices at 956)."""
    reference = np.asarray(reference, dtype=np.float64)
    predictions = np.asarray(predictions, dtype=np.float64)
    shp = reference.shape
    if idx is None:
        residuals = reference - predictions
    else:
        idx = np.asarray(idx)
        ref2 = reference.reshape((shp[0], -1)) if reference.ndim == 3 \
            else reference
        pred2 = predictions.reshape((shp[0], -1)) if predictions.ndim == 3 \
            else predictions
        idx = idx[ref2[0, idx] != nodata]
        residuals = ref2[:, idx] - pred2[:, idx]
    return np.sqrt(np.square(residuals).sum(axis=0) / n)


def predict_spectra_from_abundance(abundances, endmembers):
    """Forward model R = A·S, returned band-major (p, c).
    Reference: lsma.py:744-757."""
    return np.dot(abundances, endmembers).swapaxes(0, 1)


def combine_endmembers_and_normalize(abundances, es=(1, 2), at_end=True,
                                     nodata=NODATA):
    """Merge two abundance bands by summation, preserving sum-to-one.
    Reference: lsma.py:300-330."""
    abundances = np.asarray(abundances)
    shp = abundances.shape
    rast = abundances.copy()
    rast[rast == nodata] = 0
    c0 = rast[es[0], ...]
    c1 = rast[es[1], ...]
    abunds = [rast[e, ...] for e in range(shp[0]) if e not in es]
    combined = (c0 + c1).reshape(1, shp[1], shp[2])
    if at_end:
        return np.vstack([np.stack(abunds), combined]) if abunds \
            else combined
    return np.vstack([combined, np.stack(abunds)]) if abunds else combined


def subtract_endmember_and_normalize(abundances, e):
    """Drop band e and renormalize remaining bands to sum-to-one.
    Reference: lsma.py:842-855."""
    abundances = np.asarray(abundances, dtype=np.float64)
    f = e + 1
    shp = abundances.shape
    stack = np.vstack((abundances[0:e, ...], abundances[f:shp[0], ...]))\
        .reshape((shp[0] - 1, shp[1] * shp[2]))
    sums = stack.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = stack / sums
    return out.reshape((shp[0] - 1, shp[1], shp[2]))


def mask_unstable_abundances(abundances, band=1, nodata=NODATA, tol=0.9999):
    """Mask pixels where one abundance band exceeds ``tol`` (SASMA
    instability fix). Reference: sasma.py:296-311."""
    abundances = np.array(abundances, copy=True)
    abundances[:, abundances[band, ...] > tol] = nodata
    return abundances

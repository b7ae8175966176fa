"""IDW kernel-window interpolation for SASMA endmember maps.

Reference: sasma.py:114-186 (eye / kernel_idw_l1 weight windows) and
sasma.py:189-293 (interpolate_endmember_map / interpolate_endmember_spectra
via scipy.ndimage.generic_filter). SciPy is absent, and generic_filter's
per-pixel Python callback is the anti-pattern at scale anyway; the same
math — weighted sum of in-window values over weighted count of non-zero
contributors, NoData-as-zero contribution (sasma.py:227-231, 285-292) —
is computed here with two FFT convolutions per band, which is exact for
these separable-free kernels up to float rounding and vectorizes over the
whole tile (plus halo).
"""

from __future__ import annotations

import numpy as np

from ..constants import NODATA


def eye(size, band_num=None):
    """Donut-shaped binary kernel. Reference: sasma.py:114-136."""
    c = int(np.floor(np.median(range(0, size))))
    win = np.ones((size, size))
    win[c, c] = 0
    if band_num is not None:
        win = np.repeat(win.reshape((1, size, size)), band_num, axis=0)
    return win


def kernel_idw_l1(size, band_num=None, normalize=False,
                  moore_contiguity=False):
    """Inverse-distance weights by L1 (Rook) or Chebyshev (Queen/Moore)
    distance. Reference: sasma.py:139-186."""
    c = int(np.floor(np.median(range(0, size))))
    window = np.zeros((size, size))
    for i in range(size):
        for j in range(size):
            if i == j == c:
                continue
            if moore_contiguity:
                window[i, j] = 1 / max(abs(j - c), abs(i - c))
            else:
                window[i, j] = 1 / (abs(j - c) + abs(i - c))
    if normalize:
        window = window / np.sum(window)
    if band_num is not None:
        window = np.repeat(window.reshape((1, size, size)), band_num,
                           axis=0)
    return window


def _conv2_same(img, kern):
    """2-D 'same' correlation with zero padding via FFT (kernels here are
    symmetric, so correlation == convolution)."""
    ih, iw = img.shape
    kh, kw = kern.shape
    fh, fw = ih + kh - 1, iw + kw - 1
    F = np.fft.rfft2(img, s=(fh, fw))
    K = np.fft.rfft2(kern, s=(fh, fw))
    full = np.fft.irfft2(F * K, s=(fh, fw))
    r0, c0 = (kh - 1) // 2, (kw - 1) // 2
    return full[r0:r0 + ih, c0:c0 + iw]


def interpolate_window(em_map, window, cval=0, nodata=NODATA):
    """Single-band weighted window interpolation (the generic_filter body
    at sasma.py:285-292): for each pixel, sum(window*values) /
    sum(window*(values != cval)), with NoData replaced by cval first.

    em_map: (1, m, n) or (m, n). Returns (1, m, n) float64.
    """
    em = np.asarray(em_map, dtype=np.float64)
    if em.ndim == 3:
        em = em[0]
    vals = np.where(em == nodata, cval, em)
    contrib = (vals != cval).astype(np.float64)
    kern = np.asarray(window, dtype=np.float64)
    if kern.ndim == 1:
        s = int(np.sqrt(kern.size))
        kern = kern.reshape((s, s))
    num = _conv2_same(vals, kern)
    den = _conv2_same(contrib, kern)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = num / den
    return out.reshape((1,) + em.shape)


def interpolate_endmember_map(spectra, em_locations, window, q=3, n=2,
                              labels=None, cval=0, nodata=NODATA):
    """Synthesize per-endmember spectral maps by masking candidate pixels
    per class then window-interpolating each (class, band) image.
    Reference: sasma.py:189-265 (the ProcessPoolExecutor fan-out is
    replaced by the engine's map_batches; output identical)."""
    from itertools import product
    from .masks import binary_mask

    spectra = np.asarray(spectra)
    shp = spectra.shape
    if labels is None:
        labels = range(1, q + 1)
    labels = list(labels)
    if len(labels) > shp[0]:
        raise ValueError("need p bands >= number of labels")
    em_locations = np.asarray(em_locations)
    masked = [
        binary_mask(spectra[j, ...].reshape((1, shp[1], shp[2])),
                    np.where(em_locations == i, 1, 0), nodata=nodata,
                    invert=True)
        for i, j in product(labels, range(n))
    ]
    result = [interpolate_window(m, window, cval, nodata) for m in masked]
    synth = []
    for i in range(q):
        synth.append(np.concatenate(result[i * n:(i + 1) * n], axis=0))
    return synth


def concat_endmember_arrays(*em_rast_arrays):
    """(p, m, n) arrays ×q → (c, q, p) per-pixel endmember array.
    Reference: sasma.py:96-111 (shape contract pinned by
    test/tests.py:88-101)."""
    shp = em_rast_arrays[0].shape
    vectors = [np.asarray(e).reshape((shp[0], shp[1] * shp[2])).T
               for e in em_rast_arrays]
    return np.concatenate(
        [e.reshape((shp[1] * shp[2], shp[0], 1)).swapaxes(1, 2)
         for e in vectors], axis=1)

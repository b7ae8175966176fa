"""GLCM texture counts with the directed leading-edge halo: the
distributed per-image co-occurrence matrix must equal a full-image
single-machine reference (proves the anchor-in-tile partitioning and
border-pair plumbing) at both displacements and several batch sizes,
with NODATA pairs excluded."""

import numpy as np
import pytest

import ray.data

from unmixing_ray.constants import NODATA
from unmixing_ray.stages.texture import glcm_counts, quantize_levels

from test_focal import _tiles_table


def _full_image_glcm(arr, levels, vmax, dy, dx, band):
    a2 = arr[band]
    if dy:
        a, b = a2[:-1, :].ravel(), a2[1:, :].ravel()
    else:
        a, b = a2[:, :-1].ravel(), a2[:, 1:].ravel()
    ok = (a != NODATA) & (b != NODATA)
    code = (quantize_levels(a[ok], levels, vmax) * np.int64(levels)
            + quantize_levels(b[ok], levels, vmax))
    cnt = np.bincount(code, minlength=levels * levels)
    return {(int(c) // levels, int(c) % levels): int(cnt[c])
            for c in np.flatnonzero(cnt)}


@pytest.mark.parametrize("dy,dx", [(0, 1), (1, 0)])
@pytest.mark.parametrize("batch_size", [2, 64])
def test_glcm_matches_full_image(ray_session, dy, dx, batch_size):
    rng = np.random.default_rng(11)
    images = {
        "imgA": rng.integers(-100, 11000, (3, 32, 48)).astype(np.int16),
        "imgB": rng.integers(0, 4000, (3, 48, 16)).astype(np.int16),
    }
    # plant NODATA runs so excluded pairs are non-vacuous
    images["imgA"][0, 5:9, :] = NODATA
    images["imgB"][0, :, 3] = NODATA
    t = _tiles_table(images, 16)
    out = glcm_counts(
        ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=batch_size),
        levels=8, vmax=9999, dy=dy, dx=dx, band=0).to_pandas()
    for img, arr in images.items():
        want = _full_image_glcm(arr, 8, 9999, dy, dx, 0)
        sub = out[out["image_id"] == img]
        got = {(int(r.la), int(r.lb)): int(r.n)
               for r in sub.itertuples()}
        assert got == want, img

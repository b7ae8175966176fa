import numpy as np
import pytest

from unmixing_ray.kernels import pixels as P
from unmixing_ray.kernels import spectral as S

ND = -9999


def test_ravel_and_filter():
    arr = np.arange(24).reshape((2, 3, 4)).astype(float)
    r = P.ravel(arr)
    assert r.shape == (12, 2)
    assert r[0].tolist() == [0.0, 12.0]
    arr[0, 0, 0] = ND
    f = P.ravel_and_filter(arr)
    assert f.shape == (11, 2)
    # single band
    b = np.array([[1.0, ND], [3.0, 4.0]])
    assert P.ravel_and_filter(b).tolist() == [1.0, 3.0, 4.0]


def test_subarray_any_band_semantics():
    arr = np.ones((2, 2, 2))
    arr[:, 0, 0] = ND       # all bands NoData -> dropped
    arr[0, 1, 1] = ND       # one band NoData -> kept (any != nodata)
    out = P.subarray(arr)
    assert out.shape == (2, 3)
    idx, out2 = P.subarray(arr, indices=True)
    assert np.array_equal(out, out2)
    assert idx.shape == (2, 3)


def test_fill_bandwise():
    arr = np.array([[[1.0, ND], [3.0, 5.0]], [[10.0, 20.0], [ND, 30.0]]])
    out = P.fill_nodata_bandwise(arr)
    assert out[0, 0, 1] == pytest.approx(3.0)   # band-0 mean of 1,3,5
    assert out[1, 1, 0] == pytest.approx(20.0)
    out2 = P.fill_nodata_bandwise(arr, fill_values=[7.0, 8.0])
    assert out2[0, 0, 1] == 7.0 and out2[1, 1, 0] == 8.0
    sums, counts = P.band_nan_partials(arr)
    assert counts.tolist() == [3, 3]
    assert sums.tolist() == [9.0, 60.0]


def test_normalize_reflectance():
    arr = np.full((6, 2, 2), 100.0)
    arr[:, 0, 0] = ND
    out = P.normalize_reflectance_within_image(arr)
    assert out[0, 1, 1] == pytest.approx(100.0)  # 100/100*100
    assert (out[:, 0, 0] == ND).all()


def test_spectra_at_xy_gather():
    gt = (1000.0, 30.0, 0.0, 2000.0, 0.0, -30.0)
    arr = np.arange(2 * 3 * 4).reshape((2, 3, 4))
    # pixel (px=2, py=1) -> map coords
    xy = [(1000.0 + 2 * 30.0 + 1, 2000.0 - 1 * 30.0 - 1)]
    spec = P.spectra_at_xy(arr, xy, gt)
    assert spec.shape == (1, 2)
    assert spec[0].tolist() == [arr[0, 1, 2], arr[1, 1, 2]]


def test_tasseled_cap_projection():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 5000, size=(6, 3, 3)).astype(np.float64)
    out = S.tasseled_cap_tm(arr, ncomp=3)
    assert out.shape == (3, 3, 3)
    # hand-check one pixel against the coefficient table
    manual = S.TC_TM_REFLECTANCE[:3] @ arr[:, 1, 1]
    assert np.allclose(out[:, 1, 1], manual, atol=1e-3)
    # other sensors produce 3 components by default
    assert S.tasseled_cap_oli(arr).shape == (3, 3, 3)
    assert S.tasseled_cap_etm_plus(arr).shape == (3, 3, 3)


def test_ndvi_nodata_passthrough():
    arr = np.zeros((4, 2, 2))
    arr[2] = 100.0   # red
    arr[3] = 300.0   # nir
    arr[2, 0, 0] = arr[3, 0, 0] = ND
    out = S.ndvi(arr)
    assert out.shape == (1, 2, 2)
    assert out[0, 1, 1] == pytest.approx(0.5)
    assert out[0, 0, 0] == ND


def test_bci_with_global_stats_matches_local():
    rng = np.random.default_rng(4)
    arr = rng.integers(1, 5000, size=(6, 4, 4)).astype(np.float64)
    local = S.biophysical_composition_index(arr)
    mins, maxs = S.bci_band_stats(arr)
    with_stats = S.biophysical_composition_index(arr, stats=(mins, maxs))
    assert np.allclose(local, with_stats)
    assert local.shape == (1, 4, 4)


def test_rndsi_runs():
    rng = np.random.default_rng(4)
    arr = rng.integers(1, 5000, size=(6, 4, 4)).astype(np.float64)
    out = S.rndsi(arr)
    assert out.shape == (1, 4, 4)
    assert np.isfinite(out).any()


def test_mae_rmse():
    ref = np.array([[1.0, 2.0], [3.0, 4.0]])   # (p=2, z=2)
    pred = np.array([[2.0, 2.0], [5.0, 4.0]])
    assert S.mae(ref, pred).tolist() == [3.0, 0.0]
    assert S.rmse(ref, pred, n=1).tolist() == [pytest.approx(np.sqrt(5)), 0.0]
    # idx sampling with NoData strip
    ref2 = np.array([[ND, 2.0, 3.0], [1.0, 1.0, 1.0]])
    pred2 = np.zeros((2, 3))
    out = S.rmse(ref2, pred2, idx=np.array([0, 1, 2]), n=2)
    assert out.shape == (2,)  # NoData column 0 stripped


def test_abundance_algebra():
    ab = np.array([
        [[0.2, 0.5]], [[0.3, 0.2]], [[0.5, 0.3]],
    ])  # (3, 1, 2)
    comb = S.combine_endmembers_and_normalize(ab, es=(1, 2))
    assert comb.shape == (2, 1, 2)
    assert comb[-1, 0, 0] == pytest.approx(0.8)
    sub = S.subtract_endmember_and_normalize(ab, 2)
    assert sub.shape == (2, 1, 2)
    assert sub[:, 0, 0].sum() == pytest.approx(1.0)
    pred = S.predict_spectra_from_abundance(
        np.array([[0.5, 0.5]]), np.array([[1.0, 3.0], [3.0, 5.0]]))
    assert pred.shape == (2, 1)
    assert pred[:, 0].tolist() == [2.0, 4.0]


def test_mask_unstable_abundances():
    ab = np.array([[[0.0, 0.5]], [[1.0, 0.5]]])
    out = S.mask_unstable_abundances(ab, band=1)
    assert (out[:, 0, 0] == ND).all()
    assert out[0, 0, 1] == 0.5


def test_combine_dicts_idempotent():
    from unmixing_ray.util import combine_dicts
    d1 = {"a": [1], "b": [2]}
    d2 = {"a": [3]}
    out = combine_dicts(d1, d2)
    assert sorted(out["a"]) == [1, 3] and out["b"] == [2]
    assert d1 == {"a": [1], "b": [2]}  # no side effects

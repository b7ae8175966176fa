"""SASMA kernels: CART, IDW windows, endmember concat, rectification."""

import numpy as np
import pytest

from unmixing_ray.kernels import cart as CT
from unmixing_ray.kernels import idw as I
from unmixing_ray.kernels import rectify as R

ND = -9999


def test_decision_tree_deterministic_and_correct():
    rng = np.random.default_rng(21)
    X = rng.normal(size=(300, 2))
    y = np.where(X[:, 0] + X[:, 1] > 0, 2, 1)
    t1 = CT.DecisionTree(max_depth=8).fit(X, y)
    t2 = CT.DecisionTree(max_depth=8).fit(X, y)
    pred = t1.predict(X)
    assert (pred == y).mean() > 0.95
    assert np.array_equal(t1.predict(X), t2.predict(X))
    # round-trip through broadcastable arrays
    t3 = CT.DecisionTree.from_arrays(t1.to_arrays())
    assert np.array_equal(t3.predict(X), pred)


def test_cart_learner_nodata_filtering():
    rng = np.random.default_rng(22)
    m, n = 12, 12
    y = np.where(rng.random((1, m, n)) > 0.5, 2, 1).astype(np.int32)
    x1 = (y + rng.normal(0, 0.1, (1, m, n))).astype(np.float64)
    x2 = rng.normal(size=(1, m, n))
    y[0, 0, :] = ND
    x1[0, 1, :] = ND
    learner = CT.CARTLearner(y, x1, x2)
    fit, X, labels = learner.fit_tree({"max_depth": 6})
    assert X.shape[0] == labels.shape[0] == (m - 2) * n
    pred = learner.predict()
    assert pred.shape == y.shape
    assert set(np.unique(pred)) <= {1, 2}


def test_idw_kernels():
    k = I.kernel_idw_l1(5)
    assert k[2, 2] == 0
    assert k[2, 3] == 1.0
    assert k[0, 0] == pytest.approx(1 / 4)
    km = I.kernel_idw_l1(5, moore_contiguity=True)
    assert km[0, 0] == pytest.approx(1 / 2)
    kn = I.kernel_idw_l1(5, normalize=True)
    assert kn.sum() == pytest.approx(1.0)
    e = I.eye(3)
    assert e.sum() == 8 and e[1, 1] == 0
    e3 = I.eye(3, band_num=2)
    assert e3.shape == (2, 3, 3)


def test_interpolate_window_matches_naive():
    """FFT path must equal the direct generic_filter-style computation."""
    rng = np.random.default_rng(23)
    em = rng.random((1, 12, 12))
    em[0, em[0] < 0.7] = ND   # sparse candidates
    win = I.kernel_idw_l1(5)
    out = I.interpolate_window(em, win)
    # naive sliding window
    vals = np.where(em[0] == ND, 0.0, em[0])
    pad = np.pad(vals, 2, mode="constant")
    naive = np.empty((12, 12))
    for r in range(12):
        for c in range(12):
            patch = pad[r:r + 5, c:c + 5]
            num = (patch * win).sum()
            den = ((patch != 0) * win).sum()
            naive[r, c] = num / den if den != 0 else np.nan
    mask = ~np.isnan(naive)
    assert np.allclose(out[0][mask], naive[mask], atol=1e-9)


def test_interpolate_endmember_map_shapes():
    rng = np.random.default_rng(24)
    spectra = rng.random((4, 10, 10))
    locs = rng.integers(0, 4, size=(1, 10, 10))
    win = I.kernel_idw_l1(3)
    synth = I.interpolate_endmember_map(spectra, locs, win, q=3, n=2)
    assert len(synth) == 3
    assert synth[0].shape == (2, 10, 10)


def test_concat_endmember_arrays_shape_contract():
    """(p,m,n) x q -> (c,q,p); reference pins (56639,3,6)
    (test/tests.py:88-101) — here a small analogue."""
    arrs = [np.full((6, 4, 5), i, dtype=float) for i in range(3)]
    out = I.concat_endmember_arrays(*arrs)
    assert out.shape == (20, 3, 6)
    assert (out[:, 1, :] == 1).all()


def test_hall_rectification_identity_and_linearity():
    gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
    rng = np.random.default_rng(25)
    ref = rng.integers(100, 5000, size=(3, 10, 10)).astype(np.int32)
    control = {
        "High/Bright": [(1.5, 8.5), (2.5, 7.5)],
        "Low/Dark": [(5.5, 3.5), (6.5, 2.5)],
    }
    # identical images -> identity transform (m=1, b=0)
    out = R.hall_rectification(ref, ref, gt, gt, control, control)
    assert np.array_equal(out, ref)
    # subject = 2*ref + 100 -> rectified back to ref
    sub = (ref * 2 + 100).astype(np.int32)
    out2 = R.hall_rectification(ref, sub, gt, gt, control, control)
    assert np.allclose(out2, ref, atol=1)
    # NoData survives
    sub2 = sub.copy()
    sub2[:, 0, 0] = ND
    out3 = R.hall_rectification(ref, sub2, gt, gt, control, control)
    assert (out3[:, 0, 0] == ND).all()

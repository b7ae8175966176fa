"""Mask kernel semantics, covering the reference's pinned NoData
pathologies (binary-mask and density-slice are named north-star fixtures)."""

import numpy as np
import pytest

from unmixing_ray.kernels import masks as K

ND = -9999


@pytest.fixture
def rast():
    rng = np.random.default_rng(5)
    r = rng.integers(0, 5000, size=(3, 4, 5)).astype(np.int16)
    r[:, 0, 0] = ND
    return r


def test_binary_mask_broadcasts_and_inverts(rast):
    mask = np.zeros((4, 5), dtype=np.int8)
    mask[1, 1] = 1
    out = K.binary_mask(rast, mask)
    assert (out[:, 1, 1] == ND).all()
    assert (out[:, 2, 2] == rast[:, 2, 2]).all()
    inv = K.binary_mask(rast, mask, invert=True)
    assert (inv[:, 1, 1] == rast[:, 1, 1]).all()
    assert (inv[:, 2, 2] == ND).all()
    # bool masks accepted
    out2 = K.binary_mask(rast, mask.astype(bool))
    assert np.array_equal(out, out2)
    with pytest.raises(ValueError):
        K.binary_mask(rast, np.zeros((3, 3)))


def test_density_slice(rast):
    band = rast[0:1]
    out = K.density_slice(band, threshold=2500)
    expected = ((band <= 2500) & (band != ND)).astype(np.int8)
    assert np.array_equal(out, expected)
    # NoData pixel is excluded even though -9999 <= threshold
    assert out[0, 0, 0] == 0
    # custom relation
    out2 = K.density_slice(band, rel=np.greater, threshold=2500)
    assert np.array_equal(out2, ((band > 2500) & (band != ND)).astype(np.int8))
    with pytest.raises(ValueError):
        K.density_slice(rast)  # multiband


def test_cfmask_value_sets():
    qa = np.array([[0, 1, 2], [4, 255, 66]], dtype=np.int32)
    out = K.cfmask(qa)
    assert out.shape == (1, 2, 3)
    assert out.tolist() == [[[0, 1, 1], [1, 1, 0]]]
    out2 = K.cfmask(qa, mask_values=(66,))
    assert out2[0, 1, 2] == 1 and out2.sum() == 1


def test_saturation_mask(rast):
    r = rast.copy()
    r[1, 2, 3] = 10500
    out = K.saturation_mask(r)
    assert out.shape == (1, 4, 5)
    assert out[0, 2, 3]
    assert out.sum() == 1


def test_mask_by_query(rast):
    q = rast[1] < 1000
    out = K.mask_by_query(rast, q)
    assert (out[:, q] == ND).all()
    inv = K.mask_by_query(rast, q, invert=True)
    assert (inv[:, ~q] == ND).all()


def test_copy_nodata(rast):
    target = np.ones_like(rast)
    out = K.copy_nodata(rast, target)
    assert (out[:, 0, 0] == ND).all()
    assert out[0, 1, 1] == 1


def test_combine_masks():
    a = np.array([[0, 1], [0, 1]])
    b = np.array([[1, 0], [0, 1]])
    greedy = K.combine_masks(a, b)
    assert greedy.tolist() == [[1, 1], [0, 1]]
    conservative = K.combine_masks(a, b, multiply=True)
    assert conservative.tolist() == [[0, 0], [0, 1]]
    with pytest.raises(TypeError):
        K.combine_masks(a, True)


def test_clean_mask():
    assert K.clean_mask(np.array([-2, 0, 1, 5])).tolist() == [0, 0, 1, 1]


def test_as_mask():
    r = np.array([[[0, 2], [ND, 0]], [[0, 0], [ND, 3]]], dtype=np.int16)
    out = K.as_mask(r)
    # non-zero in any band -> 1 in all bands; NoData -> 0
    assert out[:, 0, 1].tolist() == [1, 1]
    assert out[:, 1, 0].tolist() == [0, 0]
    assert out[:, 1, 1].tolist() == [1, 1]
    assert out[:, 0, 0].tolist() == [0, 0]


def test_mask_ledaps_qa():
    rast = np.ones((2, 2, 2), dtype=np.int16)
    qa = np.array([[20, 20], [20, 7000]])
    vals, counts = K.qa_value_counts(qa)
    mode = int(vals[np.argmax(counts)])
    assert mode == 20
    out = K.mask_ledaps_qa_apply(rast, qa, mode)
    assert out[:, 1, 1].tolist() == [ND, ND]
    assert out[:, 0, 0].tolist() == [1, 1]
    with pytest.raises(ValueError):
        K.mask_ledaps_qa_apply(rast, qa, 3)  # known error value

import numpy as np
import pytest

from unmixing_ray import codecs


@pytest.fixture
def arr():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 10000, size=(6, 64, 64)).astype(np.int16)
    a[:, 0:4, :] = -9999
    return a


@pytest.mark.parametrize("fmt", ["raw", "zraw", "tiff"])
def test_lossless_roundtrip(arr, fmt):
    buf = codecs.encode_image(arr, fmt)
    out = codecs.decode_image(buf, fmt, 64, 64)
    assert out.dtype == np.int16
    assert np.array_equal(out, arr)


def test_q8_psnr_and_nodata(arr):
    buf = codecs.encode_image(arr, "q8")
    out = codecs.decode_image(buf, "q8", 64, 64)
    # NoData sentinel must survive lossy coding exactly (min preservation)
    assert (out[:, 0:4, :] == -9999).all()
    assert codecs.psnr(arr, out) >= 40.0


def test_tiff_single_band():
    a = np.arange(12, dtype=np.int16).reshape((1, 3, 4))
    buf = codecs.encode_image(a, "tiff")
    assert np.array_equal(codecs.decode_image(buf, "tiff", 4, 3), a)


def test_zraw_smaller_than_raw():
    a = np.zeros((6, 64, 64), dtype=np.int16)
    assert len(codecs.encode_image(a, "zraw")) < \
        len(codecs.encode_image(a, "raw"))


def test_psnr_identical_inf(arr):
    assert codecs.psnr(arr, arr) == float("inf")

"""Composite kernel semantics: replicates the reference's NoData
pathologies (test/tests.py:179-222 pins composite2/composite3 behavior on
tiny multi-date stacks with planted -9999) using our own micro-fixtures."""

import numpy as np
import pytest

from unmixing_ray.kernels import composite as C

ND = -9999.0


@pytest.fixture
def dates():
    # 2-band 2x2 rasters over 4 dates; pixel (0,0) all-NoData in band 0,
    # pixel (1,0) valid only on the last date.
    def r(b0, b1):
        return np.array([b0, b1])
    return [
        r([[ND, 0.1], [ND, ND]], [[ND, 0.5], [ND, ND]]),
        r([[ND, 0.9], [ND, ND]], [[ND, 0.2], [ND, ND]]),
        r([[ND, 0.05], [ND, 0.2]], [[ND, 0.05], [ND, 0.2]]),
        r([[ND, 0.3], [0.4, 0.5]], [[ND, 0.3], [0.4, 0.5]]),
    ]


def test_composite2_masked_semantics(dates):
    out = C.composite2(("max", "median"), *dates, normalize=None)
    # masked max excludes NoData
    assert out[0, 0, 1] == pytest.approx(0.9)
    assert out[0, 1, 0] == pytest.approx(0.4)
    assert out[0, 0, 0] == ND
    # median over valid values only
    assert out[1, 0, 1] == pytest.approx(np.median([0.5, 0.2, 0.05, 0.3]))
    assert out[1, 1, 1] == pytest.approx(np.median([0.2, 0.5]))


def test_composite3_plain_min_includes_nodata(dates):
    out = C.composite3(("min", "median"), *dates, normalize=None)
    # plain min includes the -9999 values -> any pixel with a NoData date
    # collapses to NoData; the all-valid pixel (0,1) keeps its true min
    assert out[0, 0, 0] == ND
    assert out[0, 1, 0] == ND
    assert out[0, 1, 1] == ND
    assert out[0, 0, 1] == pytest.approx(0.05)
    # median strips NoData
    assert out[1, 1, 1] == pytest.approx(np.median([0.2, 0.5]))


def test_composite3_star_reducers(dates):
    out = C.composite3(("min*", "max*"), *dates, normalize=None)
    assert out[0, 0, 1] == pytest.approx(0.05)
    assert out[1, 0, 1] == pytest.approx(0.5)
    assert out[0, 0, 0] == ND


def test_none_drops_band(dates):
    out = C.composite3(("max", None), *dates, normalize=None)
    assert out.shape == (1, 2, 2)
    assert out[0, 0, 1] == pytest.approx(0.9)


def test_normalize_sum_unity(dates):
    out = C.composite3(("max", None), *dates, normalize="sum")
    # every non-NoData pixel normalizes to 1; all-NoData stays NoData
    assert out[0, 0, 1] == pytest.approx(1.0)
    assert out[0, 1, 1] == pytest.approx(1.0)
    assert out[0, 0, 0] == ND
    out2 = C.composite2(("max", "median"), *dates, normalize="sum")
    valid = out2[:, 0, 1]
    assert valid.sum() == pytest.approx(1.0)


def test_single_band_composite(dates):
    singles = [d[0] for d in dates]
    out = C.composite(*[d for d in dates], target_band=0, reducer="max")
    assert out.shape == (1, 2, 2)
    assert out[0, 0, 1] == pytest.approx(np.float32(0.9))
    assert out[0, 0, 0] == ND
    out2 = C.composite(*[s for s in singles], target_band=0, reducer="mean")
    assert out2[0, 1, 1] == pytest.approx(np.float32(np.mean([0.2, 0.5])))
    with pytest.raises(ValueError):
        C.composite(*singles, reducer="mode")


def test_float_nodata_coercion_discipline():
    """The reference documents an int -9999 coercion bug
    (test/tests.py:262-329); the engine's float path must produce the
    correct (float) results regardless of requested dtype."""
    ex = [
        np.array([[[-9999, 0.32], [-9999, -9999]]]),
        np.array([[[-9999, 0.30], [0.33, 0.48]]]),
    ]
    out = C.composite3(("median",), *ex, normalize=None, dtype=np.float32)
    assert out[0, 0, 1] == pytest.approx(0.31)
    assert out[0, 0, 0] == ND
    # int dtype only affects the NoData fill value, not valid medians
    out_int = C.composite3(("median",), *ex, normalize=None, dtype=int)
    assert out_int[0, 0, 1] == pytest.approx(0.31)

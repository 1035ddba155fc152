"""Signal ops vs scipy golden values."""

import numpy as np
from scipy.ndimage import gaussian_filter1d as scipy_g1d

from video_spike_tpu.ops.signal import (
    gaussian_filter1d,
    minmax_per_trial,
    one_hot_per_trial,
    standardize,
)


def test_gaussian_filter_matches_scipy(rng):
    y = rng.normal(size=(4, 100, 7)).astype(np.float32)
    for sigma, axis in [(2.0, 1), (1.5, -1), (3.0, 0)]:
        ours = np.asarray(gaussian_filter1d(y, sigma, axis=axis))
        ref = scipy_g1d(y, sigma, axis=axis)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_standardize(rng):
    x = rng.normal(loc=3.0, scale=2.0, size=(50, 10, 4))
    z, mean, std = standardize(x)
    np.testing.assert_allclose(z.mean(axis=0), 0, atol=1e-10)
    np.testing.assert_allclose(z.std(axis=0), 1, atol=1e-10)
    np.testing.assert_allclose(z * std + mean, x, atol=1e-10)


def test_standardize_zero_variance():
    x = np.ones((10, 3))
    z, mean, std = standardize(x)
    assert np.all(std == 1e-8)
    assert np.all(np.isfinite(z))


def test_one_hot_per_trial():
    arr = np.array([-1.0, 1.0, 1.0, -1.0])
    oh = one_hot_per_trial(arr, T=5)
    assert oh.shape == (4, 5, 2)
    np.testing.assert_array_equal(oh[0, :, 0], np.ones(5))   # -1 -> col 0
    np.testing.assert_array_equal(oh[1, :, 1], np.ones(5))   # +1 -> col 1
    assert oh.sum() == 4 * 5


def test_minmax(rng):
    x = rng.normal(size=(3, 8, 8))
    m = minmax_per_trial(x)
    assert m.min() >= 0 and m.max() <= 1 + 1e-12
    for i in range(3):
        assert np.isclose(m[i].max(), 1.0)
        assert np.isclose(m[i].min(), 0.0)

"""Golden-value tests for metrics vs scipy/sklearn/torch references."""

import numpy as np
import pytest
from scipy.special import gammaln
from sklearn.metrics import r2_score as sk_r2

import jax.numpy as jnp

from video_spike_tpu.ops.metrics import (
    bits_per_spike,
    bits_per_spike_per_neuron,
    metrics_list,
    neg_log_likelihood,
    r2_per_column,
    r2_score_sklearn_like,
)


def _ref_nll(rates, spikes):
    rates = np.where(rates == 0, 1e-9, rates)
    return np.sum(rates - spikes * np.log(rates) + gammaln(spikes + 1.0))


def test_neg_log_likelihood_matches_formula(rng):
    rates = rng.uniform(0.01, 3.0, size=(7, 11, 5))
    spikes = rng.poisson(1.0, size=(7, 11, 5)).astype(float)
    assert np.isclose(neg_log_likelihood(rates, spikes), _ref_nll(rates, spikes))


def test_nll_nan_masking(rng):
    rates = rng.uniform(0.01, 3.0, size=(4, 6))
    spikes = rng.poisson(1.0, size=(4, 6)).astype(float)
    spikes[0, 0] = np.nan
    m = ~np.isnan(spikes)
    assert np.isclose(neg_log_likelihood(rates, spikes),
                      _ref_nll(rates[m], spikes[m]))


def test_bits_per_spike_null_model(rng):
    K, T, N = 20, 10, 3
    spikes = rng.poisson(1.5, size=(K, T, N)).astype(float)
    # rates == per-neuron mean -> bps == 0
    null = np.tile(spikes.mean(axis=(0, 1), keepdims=True), (K, T, 1))
    assert abs(bits_per_spike(null, spikes)) < 1e-10
    # perfect-ish rates beat the null
    good = np.clip(spikes, 0.05, None)
    assert bits_per_spike(good, spikes) > 0


def test_bps_per_neuron_matches_loop(rng):
    K, T, N = 12, 10, 6
    spikes = rng.poisson(1.0, size=(K, T, N)).astype(float)
    rates = rng.uniform(0.05, 2.0, size=(K, T, N))
    fast = np.asarray(bits_per_spike_per_neuron(jnp.asarray(rates),
                                                jnp.asarray(spikes)))
    slow = np.array([bits_per_spike(rates[:, :, [i]], spikes[:, :, [i]])
                     for i in range(N)])
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)


def test_r2_matches_sklearn(rng):
    y = rng.normal(size=(50, 7))
    p = y + 0.3 * rng.normal(size=(50, 7))
    assert np.isclose(r2_score_sklearn_like(y, p), sk_r2(y, p), atol=1e-10)
    # 1-D
    assert np.isclose(r2_score_sklearn_like(y[:, 0], p[:, 0]),
                      sk_r2(y[:, 0], p[:, 0]), atol=1e-10)


def test_r2_zero_variance_conventions():
    y = np.ones((10, 2))
    p = np.ones((10, 2))
    assert r2_score_sklearn_like(y, p) == 1.0
    p2 = p + 0.1
    assert r2_score_sklearn_like(y, p2) == 0.0


def test_r2_per_column_device(rng):
    y = rng.normal(size=(40, 5)).astype(np.float32)
    p = (y + 0.2 * rng.normal(size=(40, 5))).astype(np.float32)
    dev = np.asarray(r2_per_column(jnp.asarray(y), jnp.asarray(p)))
    ref = np.array([sk_r2(y[:, i], p[:, i]) for i in range(5)])
    np.testing.assert_allclose(dev, ref, rtol=1e-3, atol=1e-4)


def test_metrics_list_trainer_convention(rng):
    """gt/pred enter as (N, T, K) like the trainer passes them."""
    K, T, N = 8, 10, 4
    spikes = rng.poisson(1.0, size=(K, T, N)).astype(float)
    preds = np.clip(spikes + 0.3 * rng.normal(size=spikes.shape), 0.01, None)
    gt_in = np.swapaxes(spikes, 0, -1)
    pr_in = np.swapaxes(preds, 0, -1)
    res = metrics_list(gt_in, pr_in, metrics=("bps", "rsquared"))
    # bps equals nanmean of the per-neuron loop
    loop = []
    for i in range(N):
        b = bits_per_spike(preds[:, :, [i]], spikes[:, :, [i]])
        loop.append(np.nan if np.isinf(b) else b)
    assert np.isclose(res["bps"], np.nanmean(loop), rtol=1e-4)
    # rsquared equals per-trial sklearn over the (N, T) planes
    r2s = [sk_r2(gt_in[:, :, i], pr_in[:, :, i]) for i in range(K)]
    assert np.isclose(res["rsquared"], np.nanmean(r2s), atol=1e-8)


def test_metrics_list_numpy_fallback_agrees(rng):
    K, T, N = 5, 6, 3
    spikes = rng.poisson(1.0, size=(K, T, N)).astype(float)
    preds = np.clip(spikes + 0.1, 0.01, None)
    gt_in = np.swapaxes(spikes, 0, -1)
    pr_in = np.swapaxes(preds, 0, -1)
    a = metrics_list(gt_in, pr_in, metrics=("bps",), use_device=True)
    b = metrics_list(gt_in, pr_in, metrics=("bps",), use_device=False)
    assert np.isclose(a["bps"], b["bps"], rtol=1e-4)

"""Stabilized InfoNCE: value + gradient correctness of the production path.

(The fused Pallas variant this file used to cover was retired after losing
10-30x to XLA at every production shape — ops/contrastive.py records the
measurements. These tests pin the semantics the kernel was verified
against: stop-gradient max subtraction and exact learnable-tau gradients.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.ops.contrastive import info_nce


def _ref_losses(ref, pos, neg, tau):
    pos_dist = jnp.einsum("nd,nd->n", ref, pos) / tau
    neg_dist = jnp.einsum("nd,md->nm", ref, neg) / tau
    c = jax.lax.stop_gradient(jnp.max(neg_dist, axis=1, keepdims=True))
    return (-jnp.mean(pos_dist - c[:, 0]),
            jnp.mean(jax.nn.logsumexp(neg_dist - c, axis=1)))


@pytest.mark.parametrize("n,d,tau", [(32, 8, 1.0), (17, 3, 0.1),
                                     (64, 130, 0.5)])
def test_matches_reference_math(rng, n, d, tau):
    ref = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    out = info_nce(ref, pos, neg, tau)
    pr, nr = _ref_losses(ref, pos, neg, tau)
    assert np.isclose(float(out["pos_loss"]), float(pr), rtol=1e-5, atol=1e-6)
    assert np.isclose(float(out["neg_loss"]), float(nr), rtol=1e-5, atol=1e-6)
    assert np.isclose(float(out["loss"]), float(pr + nr), rtol=1e-5)


def test_tau_gradient_matches_finite_differences(rng):
    """Learnable-temperature gradient (the stop-gradient max must NOT leak
    a tau gradient through the stabilization term)."""
    n, d = 24, 6
    ref = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    def total(t):
        return info_nce(ref, pos, neg, t)["loss"]

    t0 = jnp.float32(0.7)
    g = float(jax.grad(total)(t0))
    eps = 1e-3
    fd = (float(total(t0 + eps)) - float(total(t0 - eps))) / (2 * eps)
    assert np.isclose(g, fd, rtol=1e-2, atol=1e-3), (g, fd)


def test_stabilization_is_value_invariant(rng):
    """Large similarity magnitudes: the max-subtraction keeps the loss
    finite and equal to the unstabilized value where that one is finite."""
    n, d = 8, 4
    ref = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)) * 30
    pos = ref + 0.01
    neg = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)) * 30
    out = info_nce(ref, pos, neg, 0.05)
    assert np.isfinite(float(out["loss"]))

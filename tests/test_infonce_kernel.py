"""Fused InfoNCE kernel: value + gradient parity with the reference math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.ops.pallas.infonce_kernel import info_nce_fused


def _ref_losses(ref, pos, neg, tau):
    pos_dist = jnp.einsum("nd,nd->n", ref, pos) / tau
    neg_dist = jnp.einsum("nd,md->nm", ref, neg) / tau
    c = jax.lax.stop_gradient(jnp.max(neg_dist, axis=1, keepdims=True))
    return (-jnp.mean(pos_dist - c[:, 0]),
            jnp.mean(jax.nn.logsumexp(neg_dist - c, axis=1)))


@pytest.mark.parametrize("n,d,tau", [(32, 8, 1.0), (17, 3, 0.1), (64, 130, 0.5)])
def test_fused_matches_reference(rng, n, d, tau):
    ref = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pl_, nl_ = info_nce_fused(ref, pos, neg, jnp.float32(tau))
    pr, nr = _ref_losses(ref, pos, neg, tau)
    assert np.isclose(float(pl_), float(pr), rtol=1e-5, atol=1e-6)
    assert np.isclose(float(nl_), float(nr), rtol=1e-5, atol=1e-6)


def test_fused_gradients_match_autodiff(rng):
    n, d, tau = 24, 6, 0.7
    ref = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    def fused_total(r, p, ng, t):
        a, b = info_nce_fused(r, p, ng, t)
        return a + b

    def ref_total(r, p, ng, t):
        a, b = _ref_losses(r, p, ng, t)
        return a + b

    g_fused = jax.grad(fused_total, argnums=(0, 1, 2, 3))(
        ref, pos, neg, jnp.float32(tau))
    g_ref = jax.grad(ref_total, argnums=(0, 1, 2, 3))(
        ref, pos, neg, jnp.float32(tau))
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)


def test_info_nce_dispatch_still_matches(rng):
    """The public info_nce wrapper (now kernel-backed) is unchanged."""
    from video_spike_tpu.ops.contrastive import info_nce
    n, d = 16, 4
    ref = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    out = info_nce(ref, ref, ref[::-1], 0.2)
    pr, nr = _ref_losses(ref, ref, ref[::-1], 0.2)
    assert np.isclose(float(out["loss"]), float(pr + nr), rtol=1e-5)

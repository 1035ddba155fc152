"""Fused attention: value/grad parity with the plain softmax formulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.ops.pallas.attention_kernel import _jnp_mha, fused_attention


@pytest.mark.parametrize("B,H,S,D", [(2, 4, 17, 8), (1, 2, 121, 64),
                                     (3, 1, 64, 32)])
def test_values_match_reference(rng, B, H, S, D):
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
               for _ in range(3))
    out = fused_attention(q, k, v)
    ref = _jnp_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_autodiff(rng):
    B, H, S, D = 2, 2, 12, 8
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
               for _ in range(3))

    def f_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_jnp_mha(q, k, v) ** 2)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_block_uses_fused_attention(rng):
    """The ViT Block trains through the fused core."""
    import optax
    from video_spike_tpu.models.vit_mae import Block

    model = Block(hidden=32, heads=4, mlp_dim=64, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == x.shape
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
    qkv_kernel = params["params"]["SelfAttention_0"]["qkv"]["kernel"]
    assert qkv_kernel.shape == (32, 96)

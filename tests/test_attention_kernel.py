"""Production attention (transpose-free bshd layout): value/grad parity
with the naive head-transposed formulation it replaced."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.ops.attention import attention_bshd


def _reference_bhsd(q, k, v):
    """Textbook attention in the (B, H, S, D) layout."""
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs, v)


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


@pytest.mark.parametrize("B,S,H,D", [(2, 17, 4, 8), (1, 121, 2, 64),
                                     (3, 64, 1, 32)])
def test_values_match_reference(rng, B, S, H, D):
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
               for _ in range(3))
    out = attention_bshd(q, k, v)
    ref = _to_bhsd(_reference_bhsd(_to_bhsd(q), _to_bhsd(k), _to_bhsd(v)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_transposed_formulation(rng):
    B, S, H, D = 2, 12, 2, 8
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
               for _ in range(3))

    def f(q, k, v):
        return jnp.sum(attention_bshd(q, k, v) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_bhsd(_to_bhsd(q), _to_bhsd(k),
                                       _to_bhsd(v)) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bf16_inputs_keep_f32_softmax(rng):
    """bf16 q/k/v run full-rate matmuls but the probabilities are computed
    in f32 (accuracy within bf16 resolution of the f32 result)."""
    q, k, v = (jnp.asarray(rng.normal(size=(2, 32, 2, 16)).astype(np.float32))
               for _ in range(3))
    out32 = attention_bshd(q, k, v)
    out16 = attention_bshd(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                           v.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(out16, dtype=np.float32),
                               np.asarray(out32), rtol=0.05, atol=0.05)


def test_block_trains_through_attention(rng):
    """The ViT Block trains through the production attention path."""
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

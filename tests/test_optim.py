"""adamw_lowmem: converges like optax.adamw; bf16 state dtype verified."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video_spike_tpu.ops.optim import adamw_lowmem


def _quadratic_losses(tx, steps=200, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(20, 10)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(20,)).astype(np.float32))
    params = {"w": jnp.zeros((10,), jnp.float32)}
    opt = tx.init(params)

    def loss_fn(p):
        return jnp.mean((A @ p["w"] - b) ** 2)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(steps):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    return losses


def test_lowmem_matches_adamw_convergence():
    ref = _quadratic_losses(optax.adamw(5e-2, weight_decay=0.0))
    low = _quadratic_losses(adamw_lowmem(5e-2, weight_decay=0.0))
    # same trajectory within bf16 state noise
    assert abs(low[-1] - ref[-1]) < 1e-3, (low[-1], ref[-1])
    np.testing.assert_allclose(low[:20], ref[:20], rtol=0.05, atol=1e-3)


def test_lowmem_state_is_bf16():
    tx = adamw_lowmem(1e-3)
    params = {"w": jnp.zeros((8,), jnp.float32)}
    state = tx.init(params)
    adam_state = state[0]
    assert adam_state.mu["w"].dtype == jnp.bfloat16
    assert adam_state.nu["w"].dtype == jnp.bfloat16


def test_lowmem_weight_decay_applies():
    tx = adamw_lowmem(1e-1, weight_decay=0.5)
    params = {"w": jnp.ones((4,), jnp.float32)}
    state = tx.init(params)
    grads = {"w": jnp.zeros((4,), jnp.float32)}
    updates, _ = tx.update(grads, state, params)
    # zero grads: update is pure decay = -lr * wd * w
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.05, rtol=1e-5)

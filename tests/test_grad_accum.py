"""Gradient accumulation: k micro-steps == one big-batch step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video_spike_tpu.core.config import DictConfig
from video_spike_tpu.models.linear import LinearModel
from video_spike_tpu.ops.poisson import poisson_nll_mean
from video_spike_tpu.train.base import make_optimizer


def _cfg(accum):
    return DictConfig({"optimizer": {
        "lr": 1e-3, "wd": 0.0, "eps": 1e-8, "warmup_pct": 0.15,
        "div_factor": 10, "gradient_accumulation_steps": accum}})


def test_accumulated_equals_big_batch(rng):
    model = LinearModel(encoder_hidden=(8,), encoder_out=4,
                        decoder_hidden=(8,), output_dim=100 * 2,
                        compute_dtype=jnp.float32)
    x = rng.normal(size=(8, 10)).astype(np.float32)
    ap = rng.poisson(1.0, size=(8, 100, 2)).astype(np.float32)
    params0 = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss_fn(p, xx, aa):
        return poisson_nll_mean(model.apply(p, xx), aa)

    def run(accum, batches):
        tx, _ = make_optimizer(_cfg(accum), total_steps=64)
        params = params0
        opt_state = tx.init(params)
        for xb, ab in batches:
            grads = jax.grad(loss_fn)(params, jnp.asarray(xb),
                                      jnp.asarray(ab))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params

    p_big = run(1, [(x, ap)])
    p_accum = run(2, [(x[:4], ap[:4]), (x[4:], ap[4:])])
    for a, b in zip(jax.tree.leaves(p_big), jax.tree.leaves(p_accum)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_accum_no_update_until_k(rng):
    model = LinearModel(encoder_hidden=(8,), encoder_out=4,
                        decoder_hidden=(8,), output_dim=100 * 2,
                        compute_dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    ap = jnp.asarray(rng.poisson(1.0, (4, 100, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    tx, _ = make_optimizer(_cfg(3), total_steps=64)
    opt_state = tx.init(params)
    grads = jax.grad(lambda p: poisson_nll_mean(model.apply(p, x), ap))(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    # first micro-step of 3: parameters unchanged
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

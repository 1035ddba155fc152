"""Explicit shard_map DP step == single-device step (8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video_spike_tpu.models.linear import LinearModel
from video_spike_tpu.ops.poisson import poisson_nll_mean
from video_spike_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from video_spike_tpu.parallel.shard_map_step import make_shard_map_train_step


def test_shard_map_matches_single_device(rng):
    model = LinearModel(encoder_hidden=(16,), encoder_out=8,
                        decoder_hidden=(16,), output_dim=100 * 3,
                        compute_dtype=jnp.float32)
    x = rng.normal(size=(16, 24)).astype(np.float32)
    ap = rng.poisson(1.0, size=(16, 100, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    # reference: plain full-batch step
    def ref_step(params, opt_state, x, ap):
        loss, grads = jax.value_and_grad(
            lambda p: poisson_nll_mean(model.apply(p, x), ap))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p_ref, _, loss_ref = ref_step(params, opt_state, jnp.asarray(x),
                                  jnp.asarray(ap))

    mesh = make_mesh(n_data=8, n_model=1)
    step = make_shard_map_train_step(model.apply, poisson_nll_mean, tx, mesh)
    ps = jax.device_put(params, replicated(mesh))
    os_ = jax.device_put(opt_state, replicated(mesh))
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    aps = jax.device_put(ap, batch_sharding(mesh, 3))
    p_sm, _, loss_sm = step(ps, os_, xs, aps)

    # per-shard mean-of-means == full mean only with equal shard sizes (16/8)
    assert np.isclose(float(loss_sm), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_shard_map_multiple_steps_stay_synced(rng):
    """Params remain replicated (identical across devices) over steps."""
    model = LinearModel(encoder_hidden=(8,), encoder_out=4,
                        decoder_hidden=(8,), output_dim=100 * 2,
                        compute_dtype=jnp.float32)
    x = rng.normal(size=(8, 10)).astype(np.float32)
    ap = rng.poisson(1.0, size=(8, 100, 2)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)
    mesh = make_mesh(n_data=8, n_model=1)
    step = make_shard_map_train_step(model.apply, poisson_nll_mean, tx, mesh)
    ps = jax.device_put(params, replicated(mesh))
    os_ = jax.device_put(opt_state, replicated(mesh))
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    aps = jax.device_put(ap, batch_sharding(mesh, 3))
    losses = []
    for _ in range(5):
        ps, os_, loss = step(ps, os_, xs, aps)
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # optimizing
    kernel = ps["params"]["encoder"]["Dense_0"]["kernel"]
    shards = [np.asarray(s.data) for s in kernel.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

"""Mesh/sharding: data-parallel gradient equivalence on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from video_spike_tpu.models.linear import LinearModel, first_layer_sharding_rules
from video_spike_tpu.ops.poisson import poisson_nll_mean
from video_spike_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicated,
)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_pad_batch_to_multiple():
    batch = {"x": np.ones((5, 3)), "eid": ["a"] * 5}
    padded, n = pad_batch_to_multiple(batch, 8)
    assert padded["x"].shape == (8, 3)
    assert n == 5
    batch2 = {"x": np.ones((8, 3))}
    same, n2 = pad_batch_to_multiple(batch2, 8)
    assert same["x"].shape == (8, 3) and n2 == 8


def test_dp_grads_match_single_device(rng):
    """Gradient under the 8-way sharded batch == single-device gradient."""
    model = LinearModel(encoder_hidden=(32,), encoder_out=16,
                        decoder_hidden=(32,), output_dim=100 * 4,
                        compute_dtype=jnp.float32)
    x = rng.normal(size=(16, 40)).astype(np.float32)
    ap = rng.poisson(1.0, size=(16, 100, 4)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss(p, xx, aa):
        return poisson_nll_mean(model.apply(p, xx), aa)

    g_single = jax.grad(loss)(params, jnp.asarray(x), jnp.asarray(ap))

    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh, ndim=2))
    aps = jax.device_put(ap, batch_sharding(mesh, ndim=3))
    ps = jax.device_put(params, replicated(mesh))
    g_sharded = jax.jit(jax.grad(loss))(ps, xs, aps)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_tensor_sharding_rules(rng):
    """Huge first-layer kernels get P('model', None); outputs still match."""
    mesh = make_mesh(n_data=4, n_model=2)
    model = LinearModel(encoder_hidden=(8,), encoder_out=8,
                        decoder_hidden=(8,), output_dim=100 * 2,
                        compute_dtype=jnp.float32)
    x = rng.normal(size=(4, 1 << 19)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    rules = first_layer_sharding_rules(params, mesh)
    kernel_shd = rules["params"]["encoder"]["Dense_0"]["kernel"]
    assert kernel_shd.spec == P("model", None)

    out_ref = model.apply(params, jnp.asarray(x))
    ps = jax.device_put(params, rules)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    out_sharded = jax.jit(model.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_sharded),
                               rtol=5e-3, atol=5e-3)

"""Explicit-collective data-parallel train step via shard_map.

The jit+NamedSharding path (the trainers' default) lets XLA insert the
gradient all-reduce. This module provides the explicit formulation — each
device computes grads on its batch shard and averages them with
``jax.lax.pmean`` inside ``shard_map`` — for cases where collective
placement must be controlled by hand (e.g. fusing custom Pallas collectives
later) and as executable documentation of what the implicit path does.
This is the direct TPU-native equivalent of DDP's bucketed all-reduce
(``/root/reference/src/train.py:61-64`` via HF Accelerate/NCCL).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.5 top-level API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_shard_map_train_step(model_apply: Callable, criterion: Callable,
                              tx: optax.GradientTransformation, mesh: Mesh,
                              axis: str = "data"):
    """Build a jitted DP train step with an explicit pmean gradient average.

    `model_apply(params, x)` -> outputs; `criterion(outputs, targets)` ->
    scalar loss. Batch args are sharded on `axis`; params replicated.
    """

    def local_step(params, opt_state, x, ap):
        # runs per device on the local batch shard
        def loss_fn(p):
            return criterion(model_apply(p, x), ap)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, axis_name=axis)   # ICI all-reduce
        loss = jax.lax.pmean(loss, axis_name=axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    n_batch_dims = 1  # leading axis sharded
    pspec_batch = P(axis)
    pspec_repl = P()

    kwargs = dict(mesh=mesh,
                  in_specs=(pspec_repl, pspec_repl, pspec_batch, pspec_batch),
                  out_specs=(pspec_repl, pspec_repl, pspec_repl))
    try:  # jax.shard_map (>=0.7) renamed check_rep -> check_vma
        smapped = shard_map(local_step, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax
        smapped = shard_map(local_step, check_rep=False, **kwargs)
    return jax.jit(smapped, donate_argnums=(0, 1))

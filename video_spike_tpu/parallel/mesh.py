"""Device mesh construction and sharding helpers.

This is the TPU-native replacement for the reference's entire distributed
layer (HF Accelerate + torch DDP + NCCL, ``/root/reference/src/train.py:61-64``,
``/root/reference/config/accelerate/default.yaml``): instead of a launcher,
process groups, and implicit gradient hooks, a single-program `jit` over a
`jax.sharding.Mesh` with batch inputs sharded on the ``data`` axis makes XLA
insert the gradient all-reduce over ICI automatically.

Axes:

- ``data``  — batch/trial/session sharding (the reference's only strategy,
  DDP, maps here).
- ``model`` — optional tensor sharding for the wide readout matmuls (the
  Linear video model's first layer is (1.97M, 256) ~ 500M params; sharding
  its contracting dimension rides ICI with a single psum).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    used = devices[: n_data * n_model]
    arr = np.array(used).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    spec = P("data", *([None] * (ndim - 1))) if ndim > 1 else P("data")
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_multiple(batch: Dict, multiple: int,
                          array_keys: Optional[Sequence[str]] = None):
    """Pad the leading axis of every array in `batch` so it divides the mesh
    ``data`` axis; returns (padded_batch, n_valid). Padding repeats the last
    element; downstream eval trims with n_valid."""
    sizes = [v.shape[0] for v in batch.values() if isinstance(v, np.ndarray)]
    if not sizes:
        return batch, 0
    n = sizes[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and (array_keys is None or k in array_keys):
            reps = np.repeat(v[-1:], pad, axis=0)
            out[k] = np.concatenate([v, reps], axis=0)
        else:
            out[k] = v
    return out, n

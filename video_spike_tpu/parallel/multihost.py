"""Multi-host (multi-process) helpers for the production trainers.

The reference's multi-process story is one DataLoader per DDP rank with an
implicit gradient all-reduce (``/root/reference/src/pretrain.py:51-57``).
The TPU-native equivalent (SURVEY.md §5.8): every process runs the SAME
single program over a global ``jax.sharding.Mesh``; each host loads only its
own shard of the training trials and contributes its rows to the global
batch with :func:`jax.make_array_from_process_local_data`; eval inputs are
replicated host-local arrays turned global with
:func:`host_local_array_to_global_array`; XLA inserts the cross-host
collectives (DCN between hosts, ICI within a slice).

These helpers are no-ops in the single-process case, so the trainers carry
one code path plus thin assembly branches.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


def is_multihost() -> bool:
    return jax.process_count() > 1


def shard_files_for_process(files: Sequence[str]) -> list:
    """Host-local training shard: process i takes files[i::nproc] (the
    per-rank DataLoader split of the reference's DDP sampler)."""
    if not is_multihost():
        return list(files)
    return list(files)[jax.process_index()::jax.process_count()]


def global_any(flag: bool) -> bool:
    """Global OR across processes. Preemption signals land on different
    ranks at different instants; acting on a LOCAL flag near a global
    barrier (orbax save, collective train step) deadlocks the ranks that
    didn't see it yet — every rank must agree before anyone diverges.
    Call it at the same program point on every rank (it is a collective)."""
    if not is_multihost():
        return bool(flag)
    from jax.experimental import multihost_utils
    return bool(np.max(multihost_utils.process_allgather(
        jnp.int32(bool(flag)))))


def global_min(value: int) -> int:
    """Smallest value across processes — the common step count every host
    must agree on before entering a collective loop (local shards can
    differ by one batch)."""
    if not is_multihost():
        return int(value)
    from jax.experimental import multihost_utils
    return int(np.min(multihost_utils.process_allgather(
        jnp.int32(value))))


def local_rows_to_global(sharding, *arrays):
    """Distinct per-process rows -> one global batch (train path)."""
    return tuple(jax.make_array_from_process_local_data(sharding, a)
                 for a in arrays)


def data_axis_blocks(mesh):
    """Row-block layout of the ``data`` axis: returns ``(mine, g_min,
    private)`` where ``mine`` is this process's block ids in ascending
    global order (the order ``make_array_from_process_local_data`` maps
    contiguous local chunks onto), ``g_min`` the smallest per-process block
    count, and ``private`` whether EVERY block lives on exactly one process
    (the standard pod layout: data axis outermost, model within a host).
    The HBM trial cache requires ``private`` — a block whose model-axis
    replicas straddle hosts would need identical rows on two hosts, which
    the host-local file shards cannot provide."""
    axes = list(mesh.axis_names)
    devs = np.moveaxis(np.asarray(mesh.devices), axes.index("data"), 0)
    owners = [{d.process_index for d in devs[b].flat}
              for b in range(devs.shape[0])]
    mine = [b for b, procs in enumerate(owners)
            if jax.process_index() in procs]
    counts = [0] * jax.process_count()
    for procs in owners:
        for p in procs:
            counts[p] += 1
    return mine, min(counts), all(len(p) == 1 for p in owners)


def make_block_local_take(mesh):
    """shard_map-local gather over the ``data`` axis: each device takes
    rows from ITS OWN block of the staged dataset using block-local int32
    indices — zero collectives (nothing rides ICI or DCN), which is what
    makes the multihost HBM trial cache safe (a plain ``jnp.take`` on a
    P('data')-sharded operand would gather across hosts over DCN)."""
    try:  # jax >= 0.5 top-level API; the experimental path is deprecated
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P("data")

    def take(x_blk, ap_blk, idx_blk):
        return (jnp.take(x_blk, idx_blk, axis=0),
                jnp.take(ap_blk, idx_blk, axis=0))

    kwargs = dict(mesh=mesh, in_specs=(spec, spec, spec),
                  out_specs=(spec, spec))
    try:  # jax.shard_map (>=0.7) renamed check_rep -> check_vma
        return shard_map(take, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax
        return shard_map(take, check_rep=False, **kwargs)


def replicated_rows_to_global(mesh, spec, *arrays):
    """Identical-on-every-host rows -> one globally sharded batch (eval
    path: the val/test loaders are not sharded across hosts)."""
    from jax.experimental import multihost_utils
    return tuple(multihost_utils.host_local_array_to_global_array(
        np.asarray(a), mesh, spec) for a in arrays)


def gather_rows(array) -> np.ndarray:
    """Fetch a batch-sharded global array to every host (eval outputs)."""
    if not is_multihost():
        return np.asarray(array)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(array, tiled=True))


def replicate_tree(tree, sharding):
    """Host tree -> fully-replicated global arrays. ``jax.device_put``
    cannot target non-addressable devices, so the multihost path goes
    through ``make_array_from_callback`` (every host holds the full
    value)."""
    if not is_multihost():
        return jax.device_put(tree, sharding)

    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx, a=a: a[idx])

    return jax.tree.map(put, tree)


def put_tree(tree, shardings):
    """Host tree -> globally SHARDED arrays from full host-resident values
    — the tensor-parallel generalization of :func:`replicate_tree` (e.g.
    model-axis-sharded params when the ``model`` axis spans processes,
    where ``jax.device_put`` cannot reach the other host's devices)."""
    if not is_multihost():
        return jax.device_put(tree, shardings)

    def put(a, s):
        a = np.asarray(a)
        return jax.make_array_from_callback(
            a.shape, s, lambda idx, a=a: a[idx])

    return jax.tree.map(put, tree, shardings)

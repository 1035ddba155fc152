"""Fused Poisson-NLL spike head as a Pallas TPU kernel.

The supervised loss is ``mean(exp(x) - t * x)`` over the full (B, T, N)
lograte tensor (torch PoissonNLLLoss(log_input=True) semantics, see
``/root/reference/src/train.py:59``). One kernel pass computes the
transcendental, the product, and the block reduction in VMEM, accumulating a
single scalar across sequential grid steps; the custom VJP keeps the backward
a single fused elementwise expression XLA folds into the optimizer update.

Falls back to pure jnp off-TPU (CPU test meshes) where the fusion is free
anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS_PER_TILE = 512  # 512x128 f32 = 256 KiB per input buffer in VMEM


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _nll_sum_kernel(nvalid_ref, x_ref, t_ref, out_ref):
    """Accumulate sum(exp(x) - t*x) over masked elements of this tile."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[:].astype(jnp.float32)
    t = t_ref[:].astype(jnp.float32)
    # Global flat position of each element in this tile; mask tail padding.
    rows, lanes = x.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    flat_pos = (step * rows + row_ids) * lanes + col_ids
    valid = flat_pos < nvalid_ref[0]
    contrib = jnp.where(valid, jnp.exp(x) - t * x, 0.0)
    out_ref[0, 0] += jnp.sum(contrib)


def _pallas_nll_sum(x_flat: jax.Array, t_flat: jax.Array, n_valid: int) -> jax.Array:
    n = x_flat.shape[0]
    tile_elems = _ROWS_PER_TILE * _LANES
    padded = ((n + tile_elems - 1) // tile_elems) * tile_elems
    if padded != n:
        x_flat = jnp.pad(x_flat, (0, padded - n))
        t_flat = jnp.pad(t_flat, (0, padded - n))
    num_tiles = padded // tile_elems
    x2 = x_flat.reshape(num_tiles * _ROWS_PER_TILE, _LANES)
    t2 = t_flat.reshape(num_tiles * _ROWS_PER_TILE, _LANES)
    nvalid = jnp.array([n_valid], dtype=jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((_ROWS_PER_TILE, _LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS_PER_TILE, _LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                               memory_space=pltpu.SMEM),
    )
    total = pl.pallas_call(
        _nll_sum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * n_valid, bytes_accessed=8 * n_valid, transcendentals=n_valid),
    )(nvalid, x2, t2)
    return total[0, 0]


@jax.custom_vjp
def poisson_nll_mean_fused(log_rates: jax.Array, targets: jax.Array) -> jax.Array:
    return _forward(log_rates, targets)


def _forward(log_rates, targets):
    n = log_rates.size
    if _on_tpu() and n >= _LANES:
        s = _pallas_nll_sum(log_rates.reshape(-1), targets.reshape(-1), n)
    else:
        x = log_rates.astype(jnp.float32)
        t = targets.astype(jnp.float32)
        s = jnp.sum(jnp.exp(x) - t * x)
    return s / n


def _fwd(log_rates, targets):
    return _forward(log_rates, targets), (log_rates, targets)


def _bwd(res, g):
    log_rates, targets = res
    n = log_rates.size
    scale = (g / n).astype(jnp.float32)
    dx = (jnp.exp(log_rates.astype(jnp.float32))
          - targets.astype(jnp.float32)) * scale
    dt = -log_rates.astype(jnp.float32) * scale
    return dx.astype(log_rates.dtype), dt.astype(targets.dtype)


poisson_nll_mean_fused.defvjp(_fwd, _bwd)

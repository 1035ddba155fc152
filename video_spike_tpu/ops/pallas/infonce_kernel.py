"""Fused InfoNCE as a single Pallas TPU kernel.

One kernel computes the positive similarities (VPU elementwise+reduce), the
(n, n) negative similarity matrix (MXU matmul), the stop-gradient row max,
and the stabilized logsumexp — the whole forward of the SSL contrastive loss
(``/root/reference/src/utils/loss_utils.py:409-431`` semantics) in one VMEM
residency instead of five XLA ops with HBM round-trips of the (n, n) matrix.

The backward recomputes the (n, n) softmax in plain jnp (one fused XLA
kernel) via custom VJP. Falls back to jnp off-TPU.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _infonce_kernel(n_ref, tau_ref, ref_ref, pos_ref, neg_ref,
                    pos_loss_ref, neg_loss_ref):
    ref = ref_ref[:]
    pos = pos_ref[:]
    neg = neg_ref[:]
    n = n_ref[0]
    inv_tau = 1.0 / tau_ref[0]

    np_, d = ref.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    row_valid_1d = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0) < n

    pos_dist = jnp.sum(ref * pos, axis=1, keepdims=True) * inv_tau  # (np, 1)
    neg_dist = jax.lax.dot_general(
        ref, neg, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * inv_tau                # (np, np)

    neg_inf = jnp.float32(-1e30)
    neg_dist = jnp.where(col_ids < n, neg_dist, neg_inf)
    c = jnp.max(neg_dist, axis=1, keepdims=True)                     # (np, 1)
    lse = jnp.log(jnp.sum(jnp.where(col_ids < n,
                                    jnp.exp(neg_dist - c), 0.0), axis=1,
                          keepdims=True))                            # (np, 1)

    denom = n.astype(jnp.float32)
    pos_terms = jnp.where(row_valid_1d, pos_dist - c, 0.0)
    neg_terms = jnp.where(row_valid_1d, lse, 0.0)
    pos_loss_ref[0, 0] = -jnp.sum(pos_terms) / denom
    neg_loss_ref[0, 0] = jnp.sum(neg_terms) / denom


def _pallas_infonce(ref: jax.Array, pos: jax.Array, neg: jax.Array,
                    tau) -> Tuple[jax.Array, jax.Array]:
    n, d = ref.shape
    np_ = _round_up(max(n, _SUBLANES), _SUBLANES)
    dp = _round_up(max(d, _LANES), _LANES)

    def pad(x):
        return jnp.pad(x.astype(jnp.float32), ((0, np_ - n), (0, dp - d)))

    n_arr = jnp.asarray([n], jnp.int32)
    tau_arr = jnp.asarray([tau], jnp.float32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
    )
    pos_loss, neg_loss = pl.pallas_call(
        _infonce_kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * d, bytes_accessed=12 * n * d,
            transcendentals=n * n),
    )(n_arr, tau_arr, pad(ref), pad(pos), pad(neg))
    return pos_loss[0, 0], neg_loss[0, 0]


def _jnp_infonce(ref, pos, neg, tau):
    pos_dist = jnp.einsum("nd,nd->n", ref, pos) / tau
    neg_dist = jnp.einsum("nd,md->nm", ref, neg,
                          preferred_element_type=jnp.float32) / tau
    c = jax.lax.stop_gradient(jnp.max(neg_dist, axis=1, keepdims=True))
    pos_loss = -jnp.mean(pos_dist - c[:, 0])
    neg_loss = jnp.mean(jax.nn.logsumexp(neg_dist - c, axis=1))
    return pos_loss, neg_loss


@jax.custom_vjp
def info_nce_fused(ref: jax.Array, pos: jax.Array, neg: jax.Array,
                   tau: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(pos_loss, neg_loss) of the stabilized InfoNCE."""
    if _on_tpu():
        return _pallas_infonce(ref, pos, neg, tau)
    return _jnp_infonce(ref, pos, neg, tau)


def _fwd(ref, pos, neg, tau):
    out = info_nce_fused(ref, pos, neg, tau)
    return out, (ref, pos, neg, tau)


def _bwd(res, grads):
    ref, pos, neg, tau = res
    g_pos, g_neg = grads
    n = ref.shape[0]
    neg_dist = jnp.einsum("nd,md->nm", ref, neg,
                          preferred_element_type=jnp.float32) / tau
    w = jax.nn.softmax(neg_dist, axis=1)                       # (n, n)

    # pos_loss = -mean(ref.pos)/tau (+ stop-grad c): d/dref = -pos/(n tau)
    d_ref = (-g_pos * pos / tau + g_neg * (w @ neg) / tau) / n
    d_pos = -g_pos * ref / (n * tau)
    d_neg = g_neg * (w.T @ ref) / (n * tau)
    # learnable-temperature path differentiates through tau:
    # d pos_loss/d tau = mean(ref.pos)/tau^2;
    # d neg_loss/d tau = -mean_i sum_j w_ij (ref_i.neg_j) / tau^2
    s_pos = jnp.einsum("nd,nd->n", ref, pos)
    s_neg = neg_dist * tau
    d_tau = (g_pos * jnp.mean(s_pos)
             - g_neg * jnp.mean(jnp.sum(w * s_neg, axis=1))) / (tau ** 2)
    d_tau = jnp.asarray(d_tau, jnp.float32).reshape(
        jnp.shape(jnp.asarray(tau, jnp.float32)))
    return d_ref, d_pos, d_neg, d_tau


info_nce_fused.defvjp(_fwd, _bwd)

"""Fused self-attention core as a Pallas TPU kernel.

The ViT sequences here are short (17-121 tokens: masked MAE patches, VTT
frame tokens, temporal tokens), so a whole (S, S) attention fits VMEM and
one kernel instance per (batch, head) fuses QK^T (MXU), the numerically
stable softmax (VPU), and PV (MXU) without materializing scores in HBM —
the XLA path round-trips the (B, H, S, S) score tensor twice.

Forward is the Pallas kernel (jnp off-TPU); backward recomputes the softmax
in one fused XLA kernel via custom VJP (standard attention gradients).
"""

from __future__ import annotations

from functools import partial

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


def _mha_kernel(s_ref, q_ref, k_ref, v_ref, o_ref, *, head_dim: int):
    """One (batch*head) slice: softmax(q k^T * scale) v with tail masking.
    `head_dim` is the TRUE head dim (the refs carry lane padding)."""
    seq = s_ref[0]
    scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    sp = q.shape[0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    scores = jnp.where(col_ids < seq, scores, jnp.float32(-1e30))
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)
    o_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32)


def _pallas_mha(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    B, H, S, D = q.shape
    sp = _round_up(max(S, _SUBLANES), _SUBLANES)
    dp = _round_up(max(D, _LANES), _LANES)

    def pad(x):
        x = x.astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, 0), (0, sp - S), (0, dp - D))) \
            .reshape(B * H, sp, dp)

    seq = jnp.asarray([S], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H,),
        in_specs=[pl.BlockSpec((1, sp, dp), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, sp, dp), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_mha_kernel, head_dim=D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, sp, dp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D,
            bytes_accessed=16 * B * H * S * D,
            transcendentals=B * H * S * S),
    )(seq, pad(q), pad(k), pad(v))
    return out.reshape(B, H, sp, dp)[:, :, :S, :D]


def _jnp_mha(q, k, v):
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs, v.astype(probs.dtype),
                      preferred_element_type=jnp.float32)


def _use_pallas(q) -> bool:
    """The Pallas path pays off when the head dim fills MXU lanes and the
    sequence is long enough to amortize the per-instance grid overhead; for
    this workload's tiny attention shapes (17-121 tokens, 64-dim heads) XLA
    fuses well, and on the axon runtime every new shape costs a minutes-long
    remote compile — so the kernel is opt-in via VST_PALLAS_ATTENTION=1."""
    import os
    if os.environ.get("VST_PALLAS_ATTENTION") != "1":
        return False
    return _on_tpu() and q.shape[-1] >= 64 and q.shape[-2] >= 64


@jax.custom_vjp
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v over (B, H, S, D) inputs, f32 out."""
    if _use_pallas(q):
        return _pallas_mha(q, k, v)
    return _jnp_mha(q, k, v)


def _fwd(q, k, v):
    return fused_attention(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jnp.einsum("bhsd,bhtd->bhst", qf, kf) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    g = g.astype(jnp.float32)
    dv = jnp.einsum("bhst,bhsd->bhtd", probs, g)
    dprobs = jnp.einsum("bhsd,bhtd->bhst", g, vf)
    # softmax backward: dS = P * (dP - sum(dP * P, -1))
    dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                        keepdims=True))
    dq = jnp.einsum("bhst,bhtd->bhsd", dscores, kf) * scale
    dk = jnp.einsum("bhst,bhsd->bhtd", dscores, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_fwd, _bwd)

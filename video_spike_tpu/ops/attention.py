"""Multi-head self-attention in the layout XLA:TPU compiles best.

Measured on the chip (VTT frame-encoder shape: 960 x 64 tokens x 4 heads x
64 head-dim, bf16, fwd+bwd):

- einsum directly on the (B, S, H, D) qkv layout:            4.2 ms
- same math after transposing to (B, H, S, D) and back:     37.5 ms
- hand-written Pallas per-(batch,head) fused kernel:        slower than
  either (a 64-token score tile leaves the MXU mostly idle, and one grid
  instance per (batch, head) serializes 3840 tiny steps)

The 9x gap is pure layout: the (0, 2, 1, 3) transposes force relayouts of
every attention tensor in both passes, while einsum with batch dims
('bshd,bthd->bhst') lets XLA pick layouts. The Pallas kernel was therefore
retired (same policy as the Poisson kernel — see ops/poisson.py) and this
single jnp path, differentiated by autodiff, is the production attention.

Precision: matmuls run at input precision with f32 accumulation (full-rate
MXU for bf16 models, measured -18% step time; exact for the f32
weight-import/golden paths); softmax is always f32.

Long sequences (VideoMAE probe, S=1568): the materialized f32 score tensor
is 944 MB per layer, and this op runs at 5.7 ms (~5% MFU, HBM-bound). The
Pallas TPU flash kernel was A/B'd at that shape and only TIES at its best
legal block config (5.6 ms, pad-to-2048 block 512; the kernel requires
128-multiple blocks and 1568 has none) — measurements in
scripts/profile_attn_flash.py — so this einsum path stays the single
production attention. The frozen-probe training loop sidesteps the cost
entirely by caching backbone features per trial (train/base.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_bshd(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """softmax(q kᵀ / sqrt(D)) v over (B, S, H, D) inputs -> (B, S, H, D).

    No head transposes: the contraction layouts are expressed in the einsum
    subscripts and XLA keeps the data where it lies (see module docstring
    for the measured 9x difference).
    """
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)

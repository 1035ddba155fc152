"""Contrastive losses: stabilized InfoNCE, CEBRA-style criteria, NCE, CLIP.

Behavioral parity with ``/root/reference/src/utils/loss_utils.py``:

- `info_nce` — the numerically-stabilized InfoNCE used by the SSL trainer
  (``loss_utils.py:409-431``): row-max of the negative similarities is
  subtracted under stop-gradient before the logsumexp.
- `dot_similarity` / `euclidean_similarity` — the CEBRA similarity measures
  (``loss_utils.py:80-122``).
- `infonce_from_dists` — align + uniformity decomposition
  (``loss_utils.py:125-151``).
- `nce_loss` — Gutmann-Hyvarinen NCE (``loss_utils.py:351-386``).
- `loss_fn_` — the output-dict dispatcher the SSL trainer calls
  (``loss_utils.py:3-21``): MAE-only / contrast+recon / InfoNCE.

All of this is one (n,d)x(d,n) matmul plus row reductions — ideal MXU+VPU
fusion territory that XLA handles in a single kernel. A hand-written fused
Pallas InfoNCE was benchmarked against this jnp expression on the chip and
LOST 10-30x at every production shape (n=128 d=3: 4005 vs 127 µs; n=128
d=512: 1989 vs 164 µs; n=512 d=128: 1952 vs 196 µs — the kernel pads the
tiny embedding dim to 128 lanes and runs one serial grid step), so it was
retired under the same policy as the Poisson and attention kernels.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def dot_similarity(ref: jax.Array, pos: jax.Array, neg: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
    """(n,) ref·pos similarities and (n, n) ref·neg similarities."""
    pos_dist = jnp.einsum("ni,ni->n", ref, pos)
    neg_dist = jnp.einsum("ni,mi->nm", ref, neg,
                          preferred_element_type=jnp.float32)
    return pos_dist, neg_dist


def euclidean_similarity(ref: jax.Array, pos: jax.Array, neg: jax.Array
                         ) -> Tuple[jax.Array, jax.Array]:
    """Negative squared L2 similarities (CEBRA convention)."""
    ref_sq = jnp.einsum("ni,ni->n", ref, ref)
    pos_sq = jnp.einsum("ni,ni->n", pos, pos)
    neg_sq = jnp.einsum("ni,ni->n", neg, neg)
    pos_cos, neg_cos = dot_similarity(ref, pos, neg)
    pos_dist = -(ref_sq + pos_sq - 2 * pos_cos)
    neg_dist = -(ref_sq[:, None] + neg_sq[None, :] - 2 * neg_cos)
    return pos_dist, neg_dist


def infonce_from_dists(pos_dist: jax.Array, neg_dist: jax.Array
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(loss, align, uniform) from precomputed similarities."""
    align = jnp.mean(-pos_dist)
    uniform = jnp.mean(jax.nn.logsumexp(neg_dist, axis=1))
    return align + uniform, align, uniform


def info_nce(ref: jax.Array, pos: jax.Array, neg: jax.Array,
             tau: float | jax.Array = 1.0) -> Dict[str, jax.Array]:
    """Stabilized InfoNCE: subtract the stop-gradient row max of the negative
    similarity matrix before the softmax terms
    (``loss_utils.py:409-431`` semantics; gradients through a learnable
    ``tau`` flow exactly as in the torch autograd original). XLA fuses the
    whole expression — measurements that retired the Pallas variant are in
    the module docstring.
    """
    tau = jnp.asarray(tau, jnp.float32)
    pos_dist = jnp.einsum("nd,nd->n", ref, pos) / tau
    neg_dist = jnp.einsum("nd,md->nm", ref, neg,
                          preferred_element_type=jnp.float32) / tau
    c = jax.lax.stop_gradient(jnp.max(neg_dist, axis=1, keepdims=True))
    pos_loss = -jnp.mean(pos_dist - c[:, 0])
    neg_loss = jnp.mean(jax.nn.logsumexp(neg_dist - c, axis=1))
    return {"loss": pos_loss + neg_loss, "pos_loss": pos_loss,
            "neg_loss": neg_loss}


def nce_loss(ref: jax.Array, pos: jax.Array, neg: jax.Array,
             temperature: float = 1.0, negative_weight: float = 1.0,
             reduce: str = "mean") -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Noise contrastive estimation (per-sample, like the reference's NCE)."""
    pos_dist = jnp.einsum("ni,ni->n", ref, pos) / temperature
    neg_dist = jnp.einsum("ni,mi->nm", ref, neg) / temperature
    align = jax.nn.log_sigmoid(pos_dist)
    red = jnp.mean if reduce == "mean" else jnp.sum
    uniform = red(jax.nn.log_sigmoid(-neg_dist), axis=1)
    return align + negative_weight * uniform, align, uniform


def clip_contrastive_loss(similarity_matrix: jax.Array
                          ) -> Tuple[jax.Array, jax.Array]:
    """CLIP symmetric cross-entropy over a square similarity matrix
    (``metric_utils.py:26-34``). Returns (loss, top-1 accuracy)."""
    n = similarity_matrix.shape[0]
    labels = jnp.arange(n)
    logprobs_i = jax.nn.log_softmax(similarity_matrix, axis=1)
    logprobs_t = jax.nn.log_softmax(similarity_matrix.T, axis=1)
    loss_i = -jnp.mean(logprobs_i[jnp.arange(n), labels])
    loss_t = -jnp.mean(logprobs_t[jnp.arange(n), labels])
    top1 = jnp.mean(jnp.argmax(similarity_matrix, axis=1) == labels)
    return (loss_i + loss_t) / 2, top1


def contrast_recon_loss(ref: Dict, pos: Dict, neg: Dict,
                        fix_temp: bool = True) -> Dict[str, jax.Array]:
    """Joint InfoNCE + reconstruction objective (``loss_utils.py:22-36``)."""
    temp = 1.0 if fix_temp else ref["temp"]
    nce = info_nce(ref["z"], pos["z"], neg["z"], temp)
    mean_recon = (ref["recon_loss"] + pos["recon_loss"] + neg["recon_loss"]) / 3
    return {
        "loss": mean_recon + nce["loss"],
        "recon_loss": mean_recon,
        "pos_loss": nce["pos_loss"],
        "neg_loss": nce["neg_loss"],
        "contrast_loss": nce["loss"],
    }


def loss_fn_(ref: Dict, pos: Optional[Dict], neg: Optional[Dict],
             fix_temp: bool = True) -> Dict[str, jax.Array]:
    """Dispatch on the model-output dict shape (``loss_utils.py:3-21``):

    - MAE (pos/neg None): pure reconstruction.
    - ContrastViTMAE ('recon_loss' + 'temp'): InfoNCE + reconstruction.
    - ContrastViT ('z' + 'temp'): InfoNCE (optionally learnable temperature).
    - 'z' + 'recon_loss' (no temp): mean reconstruction across the triplet.
    """
    if pos is None and neg is None:
        return {"loss": ref["recon_loss"]}
    if "recon_loss" in ref and "temp" in ref:
        return contrast_recon_loss(ref, pos, neg, fix_temp)
    if "z" in ref and "temp" in ref:
        tau = 1.0 if fix_temp else ref["temp"]
        return info_nce(ref["z"], pos["z"], neg["z"], tau)
    if "z" in ref and "recon_loss" in ref:
        return {"loss": (ref["recon_loss"] + pos["recon_loss"]
                         + neg["recon_loss"]) / 3}
    raise ValueError("Invalid loss input")

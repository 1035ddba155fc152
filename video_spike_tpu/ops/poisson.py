"""Poisson negative log-likelihood training losses.

Semantics of ``torch.nn.PoissonNLLLoss(log_input=True, full=False)`` used by
the supervised trainer (``/root/reference/src/train.py:59``,
``/root/reference/src/trainer/base.py:141-143``):

    loss = exp(log_rate) - target * log_rate        (elementwise)

The hot path is a fused Pallas kernel (exp + mul + reduce in one VMEM pass,
custom VJP) in :mod:`video_spike_tpu.ops.pallas.poisson_kernel`; this module
provides the pure-jnp definition used as ground truth and as the fallback on
CPU test meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def poisson_nll(log_rates: jax.Array, targets: jax.Array,
                log_input: bool = True, full: bool = False,
                eps: float = 1e-8) -> jax.Array:
    """Elementwise Poisson NLL, matching torch.nn.PoissonNLLLoss semantics."""
    if log_input:
        loss = jnp.exp(log_rates) - targets * log_rates
    else:
        loss = log_rates - targets * jnp.log(log_rates + eps)
    if full:
        # Stirling approximation term for target > 1 (torch convention)
        t = targets
        stirling = t * jnp.log(t) - t + 0.5 * jnp.log(2 * jnp.pi * t)
        loss = loss + jnp.where(t > 1, stirling, 0.0)
    return loss


def poisson_nll_mean(log_rates: jax.Array, targets: jax.Array,
                     n_valid_rows: jax.Array | None = None) -> jax.Array:
    """Mean-reduced log-input Poisson NLL — the supervised training loss.

    Uses the fused Pallas kernel on TPU when shapes allow, else pure jnp.
    `n_valid_rows` masks trailing batch rows that are mesh-divisibility
    padding (the mean is taken over valid elements only).
    """
    if n_valid_rows is not None:
        nll = poisson_nll(log_rates, targets)
        b = log_rates.shape[0]
        valid = (jnp.arange(b) < n_valid_rows).astype(nll.dtype)
        valid = valid.reshape((b,) + (1,) * (nll.ndim - 1))
        per_row = nll.size // b
        return jnp.sum(nll * valid) / (n_valid_rows * per_row)
    from video_spike_tpu.ops.pallas.poisson_kernel import poisson_nll_mean_fused
    return poisson_nll_mean_fused(log_rates, targets)

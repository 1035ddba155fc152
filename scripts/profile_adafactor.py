"""A/B the 504M-param Linear-headline train step: AdamW(bf16+SR) vs
Adafactor(bf16+SR).

The headline step is HBM-bound on optimizer traffic (BASELINE.md): AdamW
moves params + grads + both Adam moments every step; Adafactor's factored
second moment is ~2M elements instead of 504M, cutting ~2 GB/step. Chained
timing through donated params, one device_get barrier (CLAUDE.md).

    python scripts/profile_adafactor.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
import optax

BATCH, T, H, W, N = 16, 120, 128, 128, 436


def timed_chained(step, params, opt_state, *batch, n=20, warmup=3):
    for i in range(warmup):
        params, opt_state, loss = step(params, opt_state, *batch,
                                       jnp.uint32(i))
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, *batch,
                                       jnp.uint32(warmup + i))
    _ = float(loss)
    return (time.perf_counter() - t0) / n


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    from video_spike_tpu.models.linear import LinearModel
    from video_spike_tpu.ops.optim import adamw_sr_bf16, apply_updates_sr
    from video_spike_tpu.ops.poisson import poisson_nll_mean

    model = LinearModel(encoder_hidden=(256, 128), encoder_out=64,
                        decoder_hidden=(128, 256), output_dim=100 * N)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (BATCH, T * H * W), dtype=np.uint8))
    ap = jnp.asarray(rng.poisson(1.0, (BATCH, 100, N)).astype(np.float32))

    def bf16_store(params):
        return jax.tree.map(
            lambda p: (p.astype(jnp.bfloat16)
                       if p.dtype == jnp.float32 and p.size >= (1 << 16)
                       else p), params)

    results = {}
    for name, make_tx in (
        ("adamw_sr", lambda: adamw_sr_bf16(
            optax.cosine_onecycle_schedule(10_000, 5e-5),
            weight_decay=0.01, eps=1e-8)),
        ("adafactor_sr", lambda: optax.adafactor(
            optax.cosine_onecycle_schedule(10_000, 5e-5))),
        # parameter-scale and clipping each cost a full f32 pass over the
        # 504M-param tensor; strip them to see the floor of the factored
        # scheme as optax implements it
        ("adafactor_lean_sr", lambda: optax.adafactor(
            optax.cosine_onecycle_schedule(10_000, 5e-5),
            multiply_by_parameter_scale=False, clipping_threshold=None)),
        # this framework's factored transform: additionally emits bf16
        # updates (optax's are f32 -> 2 extra GB of update write+read)
        ("factored_ours_sr", lambda: __import__(
            "video_spike_tpu.ops.optim", fromlist=["adafactor_lean"]
        ).adafactor_lean(optax.cosine_onecycle_schedule(10_000, 5e-5))),
    ):
        params = bf16_store(model.init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, T * H * W),
                                                 jnp.float32)))
        tx = make_tx()
        opt = tx.init(params)
        n_state = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(opt)
                      if hasattr(s, "shape"))

        def step(params, opt_state, x, ap, seed, tx=tx):
            def loss_fn(p):
                flat = x.astype(jnp.bfloat16).reshape(x.shape[0], -1)
                return poisson_nll_mean(model.apply(p, flat), ap)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return apply_updates_sr(params, updates, seed), opt_state, loss

        jstep = jax.jit(step, donate_argnums=(0, 1))
        dt = timed_chained(jstep, params, opt, x, ap)
        results[name + "_ms"] = round(dt * 1e3, 2)
        results[name + "_fps"] = round(BATCH * T / dt, 1)
        results[name + "_state_m"] = round(n_state / 1e6, 2)
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

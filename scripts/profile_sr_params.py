"""Measure bf16-parameter + stochastic-rounding AdamW vs the production
f32-parameter / bf16-moment update at the bench.py shapes.

The Linear-readout update is HBM-bound: f32 params move 2 GB each way and
f32 grads another ~4 GB. Storing params AND grads in bf16 halves that
traffic; stochastic rounding keeps the tiny AdamW steps (lr 5e-5) from
rounding away against bf16's ~0.4% relative resolution.

Timing discipline (CLAUDE.md): chain steps through donated params and sync
ONCE with a device_get; never block_until_ready on axon.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


T_FRAMES, H, W = 120, 128, 128
N_NEURONS = 436
BATCH = 16
STEPS = 40


def build_model():
    from video_spike_tpu.models.linear import LinearModel
    return LinearModel(encoder_hidden=(256, 128), encoder_out=64,
                       decoder_hidden=(128, 256), output_dim=100 * N_NEURONS)


def timeit(step, params, opt_state, x, ap, extra=()):
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, x, ap, *extra)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state, x, ap, *extra)
    float(loss)
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    from video_spike_tpu.ops.optim import adamw_lowmem
    from video_spike_tpu.ops.poisson import poisson_nll_mean

    model = build_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (BATCH, T_FRAMES * H * W),
                                 dtype=np.uint8))
    ap = jnp.asarray(rng.poisson(1.0, (BATCH, 100, N_NEURONS))
                     .astype(np.float32))

    sched = optax.cosine_onecycle_schedule(10_000, 5e-5)

    # --- baseline: f32 params, bf16 moments (current production) ---------
    params32 = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, T_FRAMES * H * W), jnp.float32))
    # snapshot BEFORE the baseline run donates params32's buffers
    params16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params32)
    tx = adamw_lowmem(sched, weight_decay=0.01, eps=1e-8)

    def step_f32(params, opt_state, x, ap):
        def loss_fn(p):
            flat = x.astype(jnp.bfloat16).reshape(x.shape[0], -1)
            return poisson_nll_mean(model.apply(p, flat), ap)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    ms32 = timeit(jax.jit(step_f32, donate_argnums=(0, 1)),
                  params32, tx.init(params32), x, ap)
    print(f"f32 params + bf16 moments: {ms32:.2f} ms/step "
          f"({BATCH * T_FRAMES / ms32 * 1e3:,.0f} fps)")

    # --- candidate: bf16 params + SR, bf16 grads, bf16 moments -----------
    from video_spike_tpu.ops.optim import adamw_sr_bf16
    tx_sr = adamw_sr_bf16(sched, weight_decay=0.01, eps=1e-8)
    opt16 = tx_sr.init(params16)

    def step_bf16(params, opt_state, x, ap, seed):
        def loss_fn(p):
            flat = x.astype(jnp.bfloat16).reshape(x.shape[0], -1)
            return poisson_nll_mean(model.apply(p, flat), ap)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx_sr.update(grads, opt_state, params)
        from video_spike_tpu.ops.optim import apply_updates_sr
        return apply_updates_sr(params, updates, seed), opt_state, loss

    ms16 = timeit(jax.jit(step_bf16, donate_argnums=(0, 1)),
                  params16, opt16, x, ap, extra=(jnp.uint32(1),))
    print(f"bf16 params + SR:          {ms16:.2f} ms/step "
          f"({BATCH * T_FRAMES / ms16 * 1e3:,.0f} fps)  "
          f"[{ms32 / ms16:.2f}x]")


if __name__ == "__main__":
    main()

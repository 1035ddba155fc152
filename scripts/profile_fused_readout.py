"""On-chip A/B: fused low-rank readout update vs the materialized step.

Times the headline workload's train step (bench.py: Linear readout on raw
video, batch 16, 504M-param first layer, bf16+SR store, factored second
moment) three ways at the production shape:

  a) production  — materialized grads + optax.adafactor + apply_updates_sr
                   (the shipped bench.py step; round-3 baseline ~9.3 ms)
  b) fused-xla   — rank-B factored stats + one scaled outer-product matmul,
                   XLA scheduling (materializes the f32 matmul product)
  c) fused-pallas— same, with the add+SR fused into a W-streaming Pallas
                   kernel (HBM sees only W in / W out)

Timing rules per CLAUDE.md: chain the carry through sequential dispatches,
sync ONCE via device_get; run on an idle host. Usage:
  python scripts/profile_fused_readout.py [a|b|c|pa|pb ...]  (default: a b c)

pa/pb: the VideoMAE-probe head shape (308M encoder_head over cached
(8, 1568, 768) frozen features; BASELINE.md "VideoMAE probe profile") —
pa = materialized head step (the 6.66 ms round-3 record), pb = fused.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")
from video_spike_tpu.core.runtime import setup_runtime  # noqa: E402

setup_runtime()

from video_spike_tpu.models.linear import LinearModel          # noqa: E402
from video_spike_tpu.ops.poisson import poisson_nll_mean       # noqa: E402
from video_spike_tpu.ops.optim import apply_updates_sr         # noqa: E402
from video_spike_tpu.ops import fused_readout as fr            # noqa: E402

T_FRAMES, H, W = 120, 128, 128
N_NEURONS = 436
BATCH = 16
N_TRIALS = 64


def bf16_store(params):
    return jax.tree.map(
        lambda p: (p.astype(jnp.bfloat16)
                   if p.dtype == jnp.float32 and p.size >= (1 << 16)
                   else p), params)


def timeit(name, step, carry, args, batch=BATCH, iters=40, warmup=5):
    jstep = jax.jit(step, donate_argnums=(0,))
    for i in range(warmup):
        carry = jstep(carry, *args, jnp.uint32(i))
    _ = float(jax.tree.leaves(carry)[-1].reshape(-1)[0])  # device_get barrier
    t0 = time.perf_counter()
    for i in range(iters):
        carry = jstep(carry, *args, jnp.uint32(warmup + i))
    _ = float(jax.tree.leaves(carry)[-1].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    fps = batch * T_FRAMES / dt
    print(f"{name:20s} {dt*1e3:7.2f} ms/step   {fps:9.0f} frames/s")
    return dt


def main_probe(which):
    """Probe head arms: batch 8, features (8, 1568, 768) bf16 staged.
    The workload fixture is bench.probe_head_fixture — one source of truth
    with the production bench."""
    from bench import probe_head_fixture
    B = 8
    head, probe, params_host, hidden, ap, sched = probe_head_fixture(
        np.random.default_rng(0), B=B)

    def fresh_params():   # each arm donates its own copy
        return jax.device_put(params_host)

    def criterion(out, ap_, n_valid):
        return poisson_nll_mean(out, ap_)

    if "pa" in which:
        tx = optax.adafactor(sched, multiply_by_parameter_scale=False,
                             clipping_threshold=None)

        def step_a(carry, hidden, ap, seed):
            params, opt_state, _ = carry
            loss, grads = jax.value_and_grad(
                lambda p: criterion(head.apply(p, hidden), ap, B))(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (apply_updates_sr(params, updates, seed),
                    opt_state, loss)

        params = fresh_params()
        timeit("probe-materialized", step_a,
               (params, tx.init(params), jnp.float32(0)),
               (hidden, ap), batch=B)

    if "pb" in which:
        tx_rest = optax.adafactor(sched, multiply_by_parameter_scale=False,
                                  clipping_threshold=None)
        inner = fr.make_fused_probe_head_step(
            probe, tx_rest, sched, criterion, apply_updates_sr)

        def step_f(carry, hidden, ap, seed):
            params, opt_state, _ = carry
            p, o, loss = inner(params, opt_state, hidden, ap, B, seed)
            return (p, o, loss)

        params = fresh_params()
        timeit("probe-fused", step_f,
               (params, fr.init_fused_opt_state(
                   params, tx_rest, split=fr.split_head_kernel),
                jnp.float32(0)),
               (hidden, ap), batch=B)


def main():
    which = set(sys.argv[1:]) or {"a", "b", "c"}
    if which & {"pa", "pb"}:
        main_probe(which)
        which -= {"pa", "pb"}
        if not which:
            return
    model = LinearModel(encoder_hidden=(256, 128), encoder_out=64,
                        decoder_hidden=(128, 256),
                        output_dim=100 * N_NEURONS)
    rng = np.random.default_rng(0)
    X_all = jax.device_put(rng.integers(
        0, 255, (N_TRIALS, T_FRAMES, 1, H, W), dtype=np.uint8))
    ap_all = jax.device_put(
        rng.poisson(1.0, (N_TRIALS, 100, N_NEURONS)).astype(np.uint8))
    idx = jnp.arange(BATCH, dtype=jnp.int32)
    jax.block_until_ready((X_all, ap_all))
    sched = optax.cosine_onecycle_schedule(10_000, 5e-5)

    def init_params():
        p = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, T_FRAMES * H * W), jnp.float32))
        return bf16_store(p)

    def criterion(out, ap, n_valid):
        return poisson_nll_mean(out, ap.astype(jnp.float32))

    if "a" in which:
        params = init_params()
        tx = optax.adafactor(sched, multiply_by_parameter_scale=False,
                             clipping_threshold=None)

        def step_a(carry, X, A, ix, seed):
            params, opt_state, _ = carry
            x = jnp.take(X, ix, axis=0)
            ap = jnp.take(A, ix, axis=0)

            def loss_fn(p):
                flat = (x.astype(jnp.bfloat16) / 255.0).reshape(BATCH, -1)
                return poisson_nll_mean(model.apply(p, flat),
                                        ap.astype(jnp.float32))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (apply_updates_sr(params, updates, seed), opt_state, loss)

        timeit("production", step_a,
               (params, tx.init(params), jnp.float32(0)),
               (X_all, ap_all, idx))

    for tag, use_pallas in (("b", False), ("c", True)):
        if tag not in which:
            continue
        params = init_params()
        tx_rest = optax.adafactor(sched, multiply_by_parameter_scale=False,
                                  clipping_threshold=None)
        inner = fr.make_fused_linear_step(
            model, tx_rest, sched, criterion, apply_updates_sr,
            use_pallas=use_pallas)

        def step_f(carry, X, A, ix, seed, inner=inner):
            params, opt_state, _ = carry
            x = jnp.take(X, ix, axis=0)
            ap = jnp.take(A, ix, axis=0)
            p, o, loss = inner(params, opt_state, x, ap, BATCH, seed)
            return (p, o, loss)

        name = "fused-pallas" if use_pallas else "fused-xla"
        timeit(name, step_f,
               (params, fr.init_fused_opt_state(params, tx_rest),
                jnp.float32(0)),
               (X_all, ap_all, idx))


if __name__ == "__main__":
    main()

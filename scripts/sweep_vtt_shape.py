"""Quality-gated VTT shape sweep: step time + MFU across architecture
variants (the round-3 attack on the 13% flagship MFU recorded in
BASELINE.md "VTT flagship profile").

The VTT is the framework's own design (the reference's nearest analog is
the frozen VideoMAE probe, ``/root/reference/src/model/videomae.py``), so
its shape is a free variable: this sweep measures, on the real chip with
chained-scan timing (one device sync total — CLAUDE.md tunnel rules), the
full fwd+bwd+adamw step for each candidate shape at the production recipe
(B=16, stride 2, 128^2 video, 5 sessions x 668 max neurons) and reports
throughput + a parameterized-FLOPs MFU estimate. Quality for the
promising variants is then measured end-to-end on the /tmp/flag5
5-session fixture via ``cli.train`` (same protocol as the round-2 batch
and stride sweeps); results land in BASELINE.md.

    python scripts/sweep_vtt_shape.py            # all variants
    VTT_SWEEP_ONLY=v2_wide python scripts/sweep_vtt_shape.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

# name -> (patch, hidden, frame_depth, temporal_depth, heads, mlp_dim)
VARIANTS = {
    # production recipe (round-2 baseline: 33.9 ms, 13% MFU)
    "v0_base":     (16, 256, 4, 4, 4, 512),
    # bigger attention tiles at identical FLOPs: head_dim 64 -> 128
    "v1_heads2":   (16, 256, 4, 4, 2, 512),
    # 4x spatial tokens (256/frame): finer patches, bigger score matmuls
    "v2_patch8":   (8, 256, 4, 4, 4, 512),
    # half depth x double width: ~2x FLOPs in 512-wide matmuls
    "v3_wide":     (16, 512, 2, 2, 8, 1024),
    # wide + fat MLP (the MXU-friendliest matmul in the model)
    "v4_wide_mlp": (16, 512, 2, 2, 8, 2048),
    # same-depth wider MLP at hidden 256 (capacity up, K stays 256)
    "v5_mlp1024":  (16, 256, 4, 4, 4, 1024),
    # round-2 combinations: the head_dim-128 win applied to the wide shape,
    # and the head_dim lever pushed to a single 256-wide head
    "v6_wide_h4":  (16, 512, 2, 2, 4, 1024),
    "v7_heads1":   (16, 256, 4, 4, 1, 512),
    "v8_wide_h2":  (16, 512, 2, 2, 2, 1024),
}


def chained(step, carry0, xs_const, iters, warmup=3):
    """Donated single-step jit dispatched sequentially with the carry
    threaded (nothing elided), one device_get sync at the end — same
    pattern as bench.py; a scan-of-N body costs minutes of remote
    compile per variant."""
    jstep = jax.jit(step, donate_argnums=(0,))
    carry = carry0
    for _ in range(warmup):
        carry = jstep(carry, *xs_const)
    _ = float(jax.tree.leaves(carry)[0].reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        carry = jstep(carry, *xs_const)
    _ = float(jax.tree.leaves(carry)[0].reshape(-1)[0])
    return (time.time() - t0) / iters


def model_tflops(B, T_enc, HW, N, patch, d, fd, td, heads, mlp):
    """fwd FLOPs x3 (fwd+bwd) — same accounting as profile_vtt.py."""
    s = (HW // patch) ** 2
    per_layer = 8 * s * d * d + 4 * s * s * d + 4 * s * d * mlp
    fe = B * T_enc * (fd * per_layer + 2 * s * d * patch * patch)
    tl = B * td * (8 * T_enc * d * d + 4 * T_enc * T_enc * d
                   + 4 * T_enc * d * mlp)
    head = B * 2 * 100 * d * N
    return 3 * (fe + tl + head) / 1e12


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    from video_spike_tpu.models.vtt import VideoTemporalTransformer
    from video_spike_tpu.ops.poisson import poisson_nll_mean

    B = int(os.environ.get("VTT_SWEEP_BATCH", 16))
    stride = int(os.environ.get("VTT_SWEEP_STRIDE", 2))
    T, HW, N, S = 120, 128, 668, 5
    iters = int(os.environ.get("VTT_SWEEP_ITERS", 20))
    only = os.environ.get("VTT_SWEEP_ONLY")  # comma-separated names
    only = set(only.split(",")) if only else None

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.integers(0, 255, (B, T, 1, HW, HW), np.uint8))
    ap = jnp.asarray(rng.poisson(1.0, (B, 100, N)).astype(np.float32))
    sids = jnp.asarray(rng.integers(0, S, (B,)).astype(np.int32))

    for name, (patch, d, fd, td, heads, mlp) in VARIANTS.items():
        if only and name not in only:
            continue
        model = VideoTemporalTransformer(
            n_sessions=S, max_neurons=N, t_frames=T, t_bins=100,
            patch_size=patch, hidden=d, frame_depth=fd, temporal_depth=td,
            heads=heads, mlp_dim=mlp, frame_stride=stride)
        params = model.init(jax.random.PRNGKey(0), video[:1], sids[:1])
        tx = optax.adamw(1e-4, weight_decay=0.01)
        opt_state = tx.init(params)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(params))

        def full_step(carry, video, ap, sids, model=model, tx=tx):
            params, opt_state = carry

            def loss_fn(p):
                return poisson_nll_mean(model.apply(p, video, sids), ap)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        dt = chained(full_step, (params, opt_state), (video, ap, sids),
                     iters)
        tf = model_tflops(B, T // stride, HW, N, patch, d, fd, td, heads,
                          mlp)
        print(json.dumps({
            "variant": name, "patch": patch, "hidden": d,
            "frame_depth": fd, "temporal_depth": td, "heads": heads,
            "mlp_dim": mlp, "params_m": round(n_params / 1e6, 2),
            "step_ms": round(dt * 1e3, 2),
            "frames_per_s": round(B * T / dt),
            "model_tflops_per_step": round(tf, 4),
            "mfu_pct": round(tf / (dt * 197) * 100, 2),
        }), flush=True)


if __name__ == "__main__":
    main()

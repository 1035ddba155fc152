"""Ablation profile of the VTT flagship train step (BASELINE.md breakdown).

Times, on the real chip, with chained scans (one device sync total — see
CLAUDE.md on the tunnel RTT):

  1. full train step (fwd+bwd+adamw), the production configuration;
  2. frame-encoder-only train step (the (B*T, 64-token) ViT);
  3. temporal-stack-only train step (temporal blocks + resample + heads +
     Poisson loss on precomputed frame embeddings);
  4. full forward only.

    python scripts/profile_vtt.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def chained(step, carry0, xs_const, iters):
    """Steady-state seconds/iter: scan the step with the carry threaded so
    nothing can be elided, sync once at the end via device_get."""
    def body(carry, _):
        return step(carry, *xs_const), None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    out = run(carry0)                      # compile + warm
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # real barrier: a
    # device_get; block_until_ready can return early on this runtime
    t0 = time.time()
    out = run(out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # tunnel-safe barrier
    return (time.time() - t0) / iters


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    from video_spike_tpu.models.vtt import VideoTemporalTransformer, FrameEncoder
    from video_spike_tpu.ops.poisson import poisson_nll_mean

    B = int(os.environ.get("VTT_PROFILE_BATCH", 8))
    T, HW, N, S = 120, 128, 668, 5
    # shape knobs default to the historical round-1/2 profile shape; the
    # round-3 recipe (BASELINE.md "VTT shape sweep") is hidden=512 depth=2
    # heads=2 mlp=1024 stride=2
    hidden = int(os.environ.get("VTT_PROFILE_HIDDEN", 256))
    depth = int(os.environ.get("VTT_PROFILE_DEPTH", 4))
    heads = int(os.environ.get("VTT_PROFILE_HEADS", 4))
    mlp = int(os.environ.get("VTT_PROFILE_MLP", 2 * hidden))
    iters = int(os.environ.get("VTT_PROFILE_ITERS", 20))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.integers(0, 255, (B, T, 1, HW, HW), np.uint8))
    ap = jnp.asarray(rng.poisson(1.0, (B, 100, N)).astype(np.float32))
    sids = jnp.asarray(rng.integers(0, S, (B,)).astype(np.int32))

    stride = int(os.environ.get("VTT_PROFILE_STRIDE", 1))
    # round-5 MFU-attempt variants (models/vtt.py FrameEncoder docstring)
    mm_patch = os.environ.get("VTT_PROFILE_MATMUL_PATCHIFY", "0") == "1"
    pool_pre = os.environ.get("VTT_PROFILE_POOL_BEFORE_NORM", "0") == "1"
    # VTT_PROFILE_SECTIONS=full times only section 1 (each extra section is
    # a fresh multi-minute remote compile; the A/B sweeps don't need them)
    sections = os.environ.get("VTT_PROFILE_SECTIONS", "all")
    model = VideoTemporalTransformer(
        n_sessions=S, max_neurons=N, t_frames=T, t_bins=100, patch_size=16,
        hidden=hidden, frame_depth=depth, temporal_depth=depth, heads=heads,
        mlp_dim=mlp, frame_stride=stride, matmul_patchify=mm_patch,
        pool_before_norm=pool_pre)
    params = model.init(jax.random.PRNGKey(0), video[:1], sids[:1])
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = tx.init(params)

    results = {}

    # 1. full train step
    def full_step(carry, video, ap, sids):
        params, opt_state = carry
        def loss_fn(p):
            return poisson_nll_mean(model.apply(p, video, sids), ap)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    dt = chained(full_step, (params, opt_state), (video, ap, sids), iters)
    results["full_train_step_ms"] = dt * 1e3
    results["frames_per_s"] = B * T / dt

    if sections == "full":
        _finish(results, dt, B, T, HW, N, stride, hidden, depth, mlp)
        return

    # 2. frame encoder only (fwd+bwd, same (B*T) frame batch)
    fe = FrameEncoder(16, hidden, depth, heads, mlp, name="frame_encoder",
                      matmul_patchify=mm_patch, pool_before_norm=pool_pre)
    # the encoder sees every stride-th frame, matching the full model
    frames = (video[:, ::stride].astype(jnp.float32) / 255.0
              ).reshape(B * (T // stride), 1, HW, HW)
    fe_params = {"params": params["params"]["frame_encoder"]}

    def fe_step(p, frames):
        g = jax.grad(lambda p: jnp.mean(fe.apply(p, frames) ** 2))(p)
        return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)

    results["frame_encoder_ms"] = chained(fe_step, fe_params, (frames,),
                                          iters) * 1e3

    # 3. temporal stack only (fwd+bwd on precomputed embeddings)
    emb = jnp.asarray(rng.normal(size=(B, T // stride, hidden))
                      .astype(np.float32))

    import flax.linen as nn
    from video_spike_tpu.models.vit_mae import Block, sincos_pos_embed_1d
    from video_spike_tpu.models.vtt import time_resample_init

    class TemporalOnly(nn.Module):
        @nn.compact
        def __call__(self, h, session_ids):  # the VTT minus frame encoder
            pos = sincos_pos_embed_1d(hidden, h.shape[1])
            h = h + jnp.asarray(pos)[None].astype(h.dtype)
            for _ in range(depth):
                h = Block(hidden, heads, mlp)(h)
            h = nn.LayerNorm(dtype=jnp.float32, name="temporal_norm")(h)
            resample = self.param(
                "time_resample",
                lambda key: jnp.asarray(time_resample_init(T // stride, 100)))
            h = jnp.einsum("btd,tz->bzd", h, resample,
                           preferred_element_type=jnp.float32)
            W = self.param("session_heads", nn.initializers.normal(0.02),
                           (S, hidden, N))
            b = self.param("session_bias", nn.initializers.zeros, (S, N))
            out = jnp.einsum("bzd,bdn->bzn", h.astype(jnp.float32),
                             W[session_ids],
                             preferred_element_type=jnp.float32)
            return out + b[session_ids][:, None, :]

    tmodel = TemporalOnly()
    tparams = tmodel.init(jax.random.PRNGKey(1), emb, sids)

    def t_step(p, emb, ap, sids):
        g = jax.grad(lambda p: poisson_nll_mean(
            tmodel.apply(p, emb, sids), ap))(p)
        return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)

    results["temporal_stack_ms"] = chained(t_step, tparams, (emb, ap, sids),
                                           iters) * 1e3

    # 4. forward only. The params fed to iteration N+1 must DEPEND on
    # iteration N's output, else the scan body is loop-invariant and XLA
    # hoists the single forward out of the loop (measured: 20 "iterations"
    # in ~1 forward's time). out*0 is not constant-foldable for floats
    # (NaN/Inf), so the chain survives while the numbers don't change.
    def fwd_step(carry, video, sids):
        p, _ = carry
        out = model.apply(p, video, sids)
        z = jnp.mean(out) * 0.0
        p = jax.tree.map(lambda a: a + z.astype(a.dtype), p)
        return p, out

    results["forward_ms"] = chained(
        fwd_step, (params, jnp.zeros((B, 100, N))), (video, sids),
        iters) * 1e3

    _finish(results, dt, B, T, HW, N, stride, hidden, depth, mlp)


def _finish(results, dt, B, T, HW, N, stride, hidden, depth, mlp):
    # model FLOPs/step (fwd+bwd ~= 3x fwd) for an MFU estimate
    t_enc = T // stride   # frames the encoder/temporal stack actually see
    s_tok, d = (HW // 16) ** 2, hidden
    per_layer = (8 * s_tok * d * d + 4 * s_tok * s_tok * d
                 + 4 * s_tok * d * mlp)
    fe_flops = B * t_enc * (depth * per_layer + 2 * s_tok * d * 16 * 16)
    tl_flops = B * depth * (8 * t_enc * d * d + 4 * t_enc * t_enc * d
                            + 4 * t_enc * d * mlp)
    head_flops = B * 2 * 100 * d * N
    results["model_tflops_per_step"] = 3 * (fe_flops + tl_flops
                                            + head_flops) / 1e12
    results["mfu_pct"] = (results["model_tflops_per_step"]
                          / (dt * 197)) * 100  # v5e bf16 peak ~197 TFLOPS
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()

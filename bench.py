"""Training-throughput benchmark: frames/sec/chip on the flagship workload.

Measures the reference's headline path (``train.sh``: Linear readout on raw
120x128x128 video, batch 16, AdamW + OneCycle + Poisson NLL — see
``/root/reference/config/train/linear_video.yaml:19-23`` and BASELINE.md) in
the framework's production configuration: the session's trials are staged in
HBM once (an IBL session is ~1-2 GB, far below HBM; `BaseTrainer` does the
same via ``training.device_cache``) and every training step gathers its
shuffled batch on-device, so steady-state epochs move no video over the
host link. The one-time staging cost is amortized over the reference's
200-epoch recipe and is reported on stderr for transparency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
compound keys guarding the rest of the zoo (VERDICT r2 #6): the VTT
flagship train step and the SSL ViT-Base pretrain step at their recipe
shapes (chained-scan timing; see scripts/bench_suite.py for the full
engineering record). The headline `value` stays the Linear number for
round-to-round continuity. Set BENCH_HEADLINE_ONLY=1 to skip the extras.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is computed
against REFERENCE_A100_FPS — now a MEASURED bound rather than an analytic
constant: the reference re-decodes every trial mp4 inside DataLoader
workers each epoch (`/root/reference/src/loader/base.py:24`), so its
sustained A100 throughput cannot exceed workers x per-core decode rate.
`scripts/torch_reference_bench.py` measured 2,654 frames/s/core (cv2, the
fast end of what torchvision's av decoder achieves) x the reference's
8-CPU SLURM allocation = 21,233 frames/s — generous, since it ignores
pickle decode, normalization, and DataLoader IPC, and grants the GPU
infinite speed (the A100 compute ceiling is ~270k fps; torch on this CPU
measures 89 fps). Sensitivity analysis in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def _chained(step, carry0, xs_const, iters, warmup=3, reps=3):
    """Steady-state s/iter: the jitted step's carry (params/opt_state) is
    threaded through sequential dispatches — every step consumes the
    previous one's outputs so nothing can be elided — and synced ONCE at
    the end via device_get (the reliable barrier on this runtime). A
    single-step jit keeps the remote compile small (a scan-of-N body takes
    minutes through the compile service). Best of ``reps`` windows: the
    tunnel host occasionally steals cycles from the client process, which
    only ever INFLATES a window, so min is the honest steady-state."""
    jstep = jax.jit(step, donate_argnums=(0,))
    carry = carry0
    for _ in range(warmup):
        carry = jstep(carry, *xs_const)
    _ = float(jax.tree.leaves(carry)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = jstep(carry, *xs_const)
        _ = float(jax.tree.leaves(carry)[0].reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_vtt_flagship(rng) -> dict:
    """The end-to-end video->spike flagship at the production recipe
    (B=16, stride 2, 5 sessions x 668 neurons; round-3 shape — wide-shallow
    with 256-wide heads, BASELINE.md "VTT shape sweep")."""
    from video_spike_tpu.models.vtt import VideoTemporalTransformer
    from video_spike_tpu.train.multisession import masked_poisson_nll
    B = 16
    model = VideoTemporalTransformer(
        n_sessions=5, max_neurons=668, t_frames=120, t_bins=100,
        patch_size=16, hidden=512, frame_depth=2, temporal_depth=2,
        heads=2, mlp_dim=1024, frame_stride=2)
    video = jnp.asarray(rng.integers(0, 255, (B, 120, 1, 128, 128),
                                     dtype=np.uint8))
    ap = jnp.asarray(rng.poisson(1.0, (B, 100, 668)).astype(np.float32))
    sids = jnp.asarray(rng.integers(0, 5, (B,)).astype(np.int32))
    nmask = jnp.ones((B, 668), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video[:1], sids[:1])
    tx = optax.adamw(1e-4, weight_decay=0.01)

    def step(carry, video, sids, nmask, ap):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(lambda p: masked_poisson_nll(
            model.apply(p, video, sids), ap, nmask, jnp.float32(B)))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    dt = _chained(step, (params, tx.init(params)), (video, sids, nmask, ap),
                  iters=20)
    return {"vtt_flagship_ms_per_step": round(dt * 1e3, 2),
            "vtt_flagship_frames_per_s": round(B * 120 / dt, 1)}


def bench_ssl_step(rng, turbo: bool = False) -> dict:
    """One SSL pretrain step at the reference recipe scale (ViT-Base-ish
    MAE, 144 px, 128 triplets; /root/reference/src/pretrain.py). With
    ``turbo``, the quality-gated MXU-matched head shape
    (vit_mae_turbo.yaml; BASELINE.md "SSL head-width sweep")."""
    from video_spike_tpu.models.vit_mae import ContrastViTMAE
    from video_spike_tpu.data.contrast import device_frame_transform
    from video_spike_tpu.ops.contrastive import loss_fn_
    cfg = dict(image_size=144, patch_size=16, num_channels=1,
               hidden_size=768, num_hidden_layers=12,
               num_attention_heads=3 if turbo else 12,
               intermediate_size=3072,
               decoder_hidden_size=512, decoder_num_hidden_layers=8,
               decoder_num_attention_heads=2 if turbo else 16,
               decoder_intermediate_size=2048, mask_ratio=0.75,
               norm_pix_loss=False, embed_size=3)
    model = ContrastViTMAE(config=cfg)
    trip = jnp.asarray(rng.integers(0, 255, (384, 1, 106, 160),
                                    dtype=np.uint8))
    x0 = device_frame_transform(trip[:1], 144)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "masking": jax.random.PRNGKey(1)}, x0)
    tx = optax.adamw(1e-4, weight_decay=0.01)

    def step(carry, triplet):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)

        def loss_fn(p):
            x = device_frame_transform(triplet, 144)
            b = x.shape[0] // 3
            out = model.apply(p, x, rngs={"masking": sub})
            ref, pos, neg = (jax.tree.map(
                lambda v: v[i * b:(i + 1) * b] if v.ndim > 0 else v, out)
                for i in range(3))
            return loss_fn_(ref, pos, neg)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, key

    dt = _chained(step, (params, tx.init(params), jax.random.PRNGKey(2)),
                  (trip,), iters=10)
    key = "ssl_vitbase_turbo" if turbo else "ssl_vitbase"
    return {f"{key}_ms_per_step": round(dt * 1e3, 2),
            f"{key}_frames_per_s": round(384 / dt, 1)}


def bench_ssl_turbo(rng) -> dict:
    return bench_ssl_step(rng, turbo=True)


def probe_head_fixture(rng, B=8, L=1568, D=768, N=436):
    """The VideoMAE-probe head workload at the production shape: a
    (B, L, D) cached-frozen-features batch feeding the 308M encoder_head ->
    decoder_head readout (models/videomae.py head(); reference
    /root/reference/src/model/videomae.py:13-14), bf16+SR parameter store.
    Single source of truth for bench_probe_head and
    scripts/profile_fused_readout.py's pa/pb arms. Returns
    (head_module, probe_like, host_params, hidden, ap, sched) — params are
    host-side so each timing arm can device_put its own donatable copy."""
    import flax.linen as nn

    class Head(nn.Module):
        @nn.compact
        def __call__(self, h):
            flat = h.reshape(h.shape[0], -1).astype(jnp.float32)
            x = nn.Dense(256, name="encoder_head")(flat)
            x = nn.Dense(100 * N, name="decoder_head")(x)
            return x.reshape(h.shape[0], 100, N)

    head = Head()
    hidden = jnp.asarray(rng.normal(size=(B, L, D))
                         .astype(np.float32)).astype(jnp.bfloat16)
    ap = jnp.asarray(rng.poisson(1.0, (B, 100, N)).astype(np.float32))
    params_host = jax.device_get(jax.tree.map(
        lambda p: (p.astype(jnp.bfloat16)
                   if p.dtype == jnp.float32 and p.size >= (1 << 16)
                   else p), head.init(jax.random.PRNGKey(0), hidden[:1])))
    sched = optax.cosine_onecycle_schedule(10_000, 5e-5)

    class ProbeLike:
        config = {"decoder": {"output_dim": 100 * N}}

    return head, ProbeLike(), params_host, hidden, ap, sched


def bench_probe_head(rng) -> dict:
    """VideoMAE-probe head step at the production configuration: frozen
    features cached in HBM (train/base.py frozen-split path), bf16+SR
    store, fused low-rank update on the 308M encoder_head
    (BASELINE.md "VideoMAE probe profile"; A/B in
    scripts/profile_fused_readout.py pa/pb)."""
    from video_spike_tpu.ops.optim import apply_updates_sr
    from video_spike_tpu.ops.poisson import poisson_nll_mean
    from video_spike_tpu.ops import fused_readout as fr
    B = 8
    _, probe, params_host, hidden, ap, sched = probe_head_fixture(rng, B=B)
    params = jax.device_put(params_host)
    tx = optax.adafactor(sched, multiply_by_parameter_scale=False,
                         clipping_threshold=None)

    inner = fr.make_fused_probe_head_step(
        probe, tx, sched,
        lambda out, a, nv: poisson_nll_mean(out, a), apply_updates_sr)

    def step(carry, hidden, ap):
        params, opt_state, i = carry
        p, o, _ = inner(params, opt_state, hidden, ap, jnp.float32(B),
                        i.astype(jnp.uint32))
        return p, o, i + 1

    dt = _chained(step, (params, fr.init_fused_opt_state(
        params, tx, split=fr.split_head_kernel), jnp.int32(0)),
        (hidden, ap), iters=40)
    return {"probe_head_ms_per_step": round(dt * 1e3, 2),
            "probe_head_frames_per_s": round(B * 120 / dt, 1)}

# measured input-pipeline bound of the reference stack (see docstring and
# BASELINE.md "vs_baseline denominator"); scripts/torch_reference_bench.py
REFERENCE_A100_FPS = 21233.0

T_FRAMES, H, W = 120, 128, 128
N_NEURONS = 436
BATCH = 16
N_TRIALS = 320            # ~630 MB of uint8 video staged in HBM
WARMUP_STEPS = 5
MEASURE_STEPS = 60        # = 3 epochs of 20 batches
MEASURE_REPS = 3          # best-of windows (host noise only inflates)


def main() -> None:
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    from video_spike_tpu.models.linear import LinearModel
    from video_spike_tpu.ops.poisson import poisson_nll_mean

    model = LinearModel(
        encoder_hidden=(256, 128), encoder_out=64,
        decoder_hidden=(128, 256), output_dim=100 * N_NEURONS)

    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, T_FRAMES * H * W), jnp.float32))
    # production policy for HBM-bound updates (the 504M-param update IS
    # the step): bf16 parameter store with stochastically-rounded updates
    # (ops/optim) + a lean factored-second-moment optimizer
    # (optax.adafactor with the parameter-scale and clipping side passes
    # off — each re-streams the 504M tensor; scripts/profile_adafactor.py:
    # AdamW-SR 12.7 ms -> 9.0 ms). Quality-gated end-to-end at the full
    # 200-epoch recipe on the 120-trial fixture: best eval bps -0.03192
    # (AdamW-SR) vs -0.02871, test bps -0.03989 vs -0.03696 —
    # equal-or-better on both (BASELINE.md "optimizer gate"). Trainer
    # knobs: optimizer.name=adafactor, param_scale=false, clipping=null,
    # param_dtype=bfloat16_sr; the reference-parity AdamW default stays in
    # configs/train/linear_video.yaml.
    # round-3 addition: the 504M first-layer gradient is rank-16, so the
    # factored-RMS step runs from closed-form rank-B statistics and one
    # scaled outer-product matmul — the 1 GB gradient is never
    # materialized (ops/fused_readout.py; trainer knob
    # optimizer.fused_readout). Measured 8.23 -> 6.14 ms/step on the chip
    # (scripts/profile_fused_readout.py); quality-gated like every
    # optimizer change (BASELINE.md "optimizer gate").
    from video_spike_tpu.ops.optim import apply_updates_sr
    from video_spike_tpu.ops import fused_readout as fr
    params = jax.tree.map(
        lambda p: (p.astype(jnp.bfloat16)
                   if p.dtype == jnp.float32 and p.size >= (1 << 16)
                   else p), params)
    sched = optax.cosine_onecycle_schedule(10_000, 5e-5)
    tx = optax.adafactor(sched, multiply_by_parameter_scale=False,
                         clipping_threshold=None)
    fused_inner = fr.make_fused_linear_step(
        model, tx, sched,
        lambda out, ap, n_valid: poisson_nll_mean(out, ap),
        apply_updates_sr)
    opt_state = fr.init_fused_opt_state(params, tx)

    def cached_step(params, opt_state, X_all, ap_all, idx, seed):
        x = jnp.take(X_all, idx, axis=0)
        ap = jnp.take(ap_all, idx, axis=0)
        return fused_inner(params, opt_state, x, ap.astype(jnp.float32),
                           jnp.float32(BATCH), seed)

    step = jax.jit(cached_step, donate_argnums=(0, 1))

    # one-time staging: the whole session's video + spikes into HBM
    t_stage = time.perf_counter()
    X_host = rng.integers(0, 255, (N_TRIALS, T_FRAMES, 1, H, W),
                          dtype=np.uint8)
    A_host = rng.poisson(1.0, (N_TRIALS, 100, N_NEURONS)).astype(np.uint8)
    X_all = jax.device_put(X_host)
    ap_all = jax.device_put(A_host)
    jax.block_until_ready((X_all, ap_all))
    stage_s = time.perf_counter() - t_stage
    print(f"staged {X_host.nbytes/1e6:.0f} MB in {stage_s:.1f}s "
          f"(one-time; amortized over the 200-epoch recipe)",
          file=sys.stderr)

    def batch_indices(n_steps):
        perm = rng.permutation(N_TRIALS)
        s = 0
        for _ in range(n_steps):
            if s + BATCH > N_TRIALS:
                perm = rng.permutation(N_TRIALS)
                s = 0
            yield jnp.asarray(perm[s:s + BATCH].astype(np.int32))
            s += BATCH

    for n, idx in enumerate(batch_indices(WARMUP_STEPS)):
        params, opt_state, loss = step(params, opt_state, X_all, ap_all, idx,
                                       jnp.uint32(n))
    float(loss)  # full sync: the axon runtime's block_until_ready returns
    # before chained executions finish; a device_get is the reliable barrier

    # best of MEASURE_REPS windows: host-side interference (the tunnel
    # client shares this 1-core host) only ever inflates a window
    dt = float("inf")
    n_seed = WARMUP_STEPS
    for _ in range(MEASURE_REPS):
        t0 = time.perf_counter()
        for n, idx in enumerate(batch_indices(MEASURE_STEPS)):
            params, opt_state, loss = step(params, opt_state, X_all, ap_all,
                                           idx, jnp.uint32(n_seed + n))
        float(loss)  # loss_N depends on params_{N-1}: syncs the whole chain
        dt = min(dt, time.perf_counter() - t0)
        n_seed += MEASURE_STEPS

    n_chips = jax.device_count()
    fps_per_chip = MEASURE_STEPS * BATCH * T_FRAMES / dt / n_chips
    record = {
        "metric": "train_frames_per_sec_per_chip",
        "value": round(fps_per_chip, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_per_chip / REFERENCE_A100_FPS, 3),
    }
    # free the staged dataset before compiling the compound workloads
    for buf in (X_all, ap_all, params, opt_state):
        jax.tree.map(lambda a: a.delete() if hasattr(a, "delete") else None,
                     buf)
    if not os.environ.get("BENCH_HEADLINE_ONLY"):
        for sub in (bench_vtt_flagship, bench_ssl_step, bench_ssl_turbo,
                    bench_probe_head):
            try:
                record.update(sub(rng))
            except Exception as e:   # the headline must still print
                record[sub.__name__ + "_error"] = str(e)[:160]
    print(json.dumps(record))


if __name__ == "__main__":
    main()

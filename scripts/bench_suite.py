"""Multi-workload benchmark: step times across the model zoo at the
reference's real recipe shapes. Prints one JSON line per workload.

    python scripts/bench_suite.py [--skip ssl_base]

(bench.py stays the driver's single-number benchmark; this suite is the
engineering record behind BASELINE.md.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
import optax


def sync(x) -> None:
    # device_get is the reliable barrier on the axon runtime
    jax.tree.map(lambda l: np.asarray(l) if hasattr(l, "dtype") else l, x)


def timed(step, *args, n=20, warmup=2):
    """Time independent dispatches; sync once (small RTT amortization)."""
    out = None
    for _ in range(warmup):
        out = step(*args)
    sync(out[-1] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(*args)
    sync(out[-1] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / n


def timed_chained(step, params, opt_state, *batch, n=20, warmup=2):
    """Time a train step by CHAINING params/opt_state through iterations —
    the device must execute every step, so dispatch elision and the ~29 ms
    sync RTT can't distort the average (see CLAUDE.md timing notes)."""
    for _ in range(warmup):
        params, opt_state, loss = step(params, opt_state, *batch)
    sync(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state, loss = step(params, opt_state, *batch)
    sync(loss)
    return (time.perf_counter() - t0) / n


def _train_step_fn(model_apply, tx, criterion):
    def step(params, opt_state, *batch):
        loss, grads = jax.value_and_grad(
            lambda p: criterion(model_apply(p, *batch[:-1]), batch[-1]))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss
    return jax.jit(step)


def bench_linear_video(rng):
    from video_spike_tpu.models.linear import LinearModel
    from video_spike_tpu.ops.poisson import poisson_nll_mean
    model = LinearModel(encoder_hidden=(256, 128), encoder_out=64,
                        decoder_hidden=(128, 256), output_dim=100 * 436)
    x = jnp.asarray(rng.integers(0, 255, (16, 120 * 128 * 128 // 8, 8),
                                 dtype=np.uint8).reshape(16, -1))
    ap = jnp.asarray(rng.poisson(1.0, (16, 100, 436)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x[:1].astype(jnp.float32))
    tx = optax.adamw(5e-5, weight_decay=0.01, mu_dtype=jnp.bfloat16)
    opt = tx.init(params)
    step = _train_step_fn(
        lambda p, v: model.apply(p, v.astype(jnp.bfloat16)), tx,
        poisson_nll_mean)
    dt = timed_chained(step, params, opt, x, ap)
    return {"workload": "linear_video_train_step", "batch": 16,
            "ms_per_step": round(dt * 1e3, 2),
            "frames_per_s": round(16 * 120 / dt, 1)}


def bench_vtt(rng):
    from video_spike_tpu.models.vtt import VideoTemporalTransformer
    from video_spike_tpu.train.multisession import masked_poisson_nll
    model = VideoTemporalTransformer(
        n_sessions=5, max_neurons=668, t_frames=120, t_bins=100,
        patch_size=16, hidden=512, frame_depth=2, temporal_depth=2,
        heads=2, mlp_dim=1024, frame_stride=2)  # round-3 recipe shape
    B = 16   # the recipe default (BASELINE.md batch-scaling sweep)
    video = jnp.asarray(rng.integers(0, 255, (B, 120, 1, 128, 128),
                                     dtype=np.uint8))
    ap = jnp.asarray(rng.poisson(1.0, (B, 100, 668)).astype(np.float32))
    sids = jnp.asarray(rng.integers(0, 5, (B,)).astype(np.int32))
    nmask = jnp.ones((B, 668), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video[:1], sids[:1])
    tx = optax.adamw(3e-4, weight_decay=0.01)
    opt = tx.init(params)

    def step(params, opt_state, video, sids, nmask, ap):
        loss, grads = jax.value_and_grad(lambda p: masked_poisson_nll(
            model.apply(p, video, sids), ap, nmask, jnp.float32(B)))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    dt = timed_chained(jstep, params, opt, video, sids, nmask, ap)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    return {"workload": "vtt_flagship_train_step", "batch": B,
            "params_m": round(n / 1e6, 1),
            "ms_per_step": round(dt * 1e3, 2),
            "frames_per_s": round(B * 120 / dt, 1)}


def bench_ssl_base(rng, turbo=False):
    """The real pretrain recipe: ViT-Base-ish MAE, 144 px, batch 128.
    ``turbo`` swaps in the quality-gated MXU-matched head shape
    (vit_mae_turbo.yaml; BASELINE.md "SSL head-width sweep")."""
    from video_spike_tpu.models.vit_mae import ContrastViTMAE
    from video_spike_tpu.data.contrast import device_frame_transform
    from video_spike_tpu.ops.contrastive import loss_fn_
    cfg = dict(image_size=144, patch_size=16, num_channels=1,
               hidden_size=768, num_hidden_layers=12,
               num_attention_heads=3 if turbo else 12,
               intermediate_size=3072, decoder_hidden_size=512,
               decoder_num_hidden_layers=8,
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
    opt = tx.init(params)

    def step(params, opt_state, triplet, key):
        def loss_fn(p):
            x = device_frame_transform(triplet, 144)
            b = x.shape[0] // 3
            out = model.apply(p, x, rngs={"masking": key})
            ref, pos, neg = (jax.tree.map(
                lambda v: v[i * b:(i + 1) * b] if v.ndim > 0 else v, out)
                for i in range(3))
            return loss_fn_(ref, pos, neg)["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    key = jax.random.PRNGKey(2)
    dt = timed_chained(jstep, params, opt, trip, key, n=10)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    steps_40k_min = 40000 * dt / 60
    name = "ssl_vitbase_turbo_144px_step" if turbo else "ssl_vitbase_144px_step"
    return {"workload": name, "batch_triplets": 128,
            "params_m": round(n / 1e6, 1),
            "ms_per_step": round(dt * 1e3, 2),
            "recipe_40k_steps_min": round(steps_40k_min, 1)}


def bench_videomae_probe(rng):
    """Frozen-backbone VideoMAE probe at the reference recipe
    (/root/reference/src/model/videomae.py:4-36: 16 of 120 frames resized
    to 224, ViT-Base backbone under stop_gradient, trainable 2-layer
    readout, batch 8 per configs/train/vmae_video.yaml), measured with the
    production trainer semantics (train/base.py): the frozen backbone
    encodes each trial ONCE (encode_ms, amortized over the 200-epoch
    recipe) and every train step runs only the head over cached features
    with a backbone-masked AdamW. full_recompute_ms is the reference-style
    loop (backbone re-run per step) for comparison."""
    from video_spike_tpu.core.config import DictConfig
    from video_spike_tpu.models.videomae import VideoMAEProbe
    from video_spike_tpu.ops.poisson import poisson_nll_mean
    from video_spike_tpu.train.base import make_optimizer
    B, N = 8, 436
    cfg = {"image_size": 224, "patch_size": 16, "num_channels": 3,
           "num_frames": 16, "tubelet_size": 2, "hidden_size": 768,
           "num_hidden_layers": 12, "num_attention_heads": 12,
           "intermediate_size": 3072, "hf_compat": True,
           "freeze_backbone": True, "pretrained_backbone": None,
           "encoder": {"output_dim": 256}, "decoder": {"output_dim": 100 * N}}
    model = VideoMAEProbe(config=cfg)
    video = jnp.asarray(rng.integers(0, 255, (B, 120, 1, 128, 128),
                                     dtype=np.uint8))
    ap = jnp.asarray(rng.poisson(1.0, (B, 100, N)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video[:1])
    tx, _ = make_optimizer(DictConfig({"optimizer": {"lr": 1e-4}}), 9000,
                           frozen_paths=model.frozen_param_paths())
    opt = tx.init(params)

    # one-time frozen encode (chained through a feature perturbation so the
    # device executes every iteration)
    encode = jax.jit(lambda p, v: model.apply(p, v, method="encode"))
    feats = encode(params, video)

    def enc_body(p, v, carry):
        # float-domain zero keeps the carry dependence (XLA can't fold
        # 0*x under NaN semantics), so every scan iteration really encodes
        return model.apply(
            p, v + (carry[0, 0, 0] * 0).astype(v.dtype), method="encode")

    enc_run = jax.jit(lambda p, v, f: jax.lax.scan(
        lambda c, _: (enc_body(p, v, c), None), f, None, length=10)[0])
    f0 = enc_run(params, video, feats)
    sync(f0[0, 0, 0])
    t0 = time.perf_counter()
    f0 = enc_run(params, video, f0)
    sync(f0[0, 0, 0])
    enc_dt = (time.perf_counter() - t0) / 10

    # steady-state head-only step over cached features
    head = jax.jit(lambda p, f: model.apply(p, f, method="head"))

    def step(params, opt_state, feats, ap):
        loss, grads = jax.value_and_grad(
            lambda p: poisson_nll_mean(head(p, feats), ap))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    dt = timed_chained(jstep, params, opt, feats, ap, n=20, warmup=3)

    # bf16+SR parameter-store variant of the head step (the 504M Linear
    # headline's optimizer.param_dtype=bfloat16_sr lever; the frozen bf16
    # backbone is exact under SR because a zero update on an
    # exactly-representable value can't carry)
    from video_spike_tpu.ops.optim import apply_updates_sr
    tx_sr, _ = make_optimizer(
        DictConfig({"optimizer": {"lr": 1e-4,
                                  "param_dtype": "bfloat16_sr"}}),
        9000, frozen_paths=model.frozen_param_paths())
    params_sr = jax.tree.map(
        lambda p: (p.astype(jnp.bfloat16)
                   if p.dtype == jnp.float32 and p.size >= (1 << 16)
                   else p), model.init(jax.random.PRNGKey(0), video[:1]))
    opt_sr = tx_sr.init(params_sr)

    def sr_step(params, opt_state, feats, ap):
        loss, grads = jax.value_and_grad(
            lambda p: poisson_nll_mean(head(p, feats), ap))(params)
        updates, opt_state = tx_sr.update(grads, opt_state, params)
        return (apply_updates_sr(params, updates, jnp.uint32(7)),
                opt_state, loss)

    jsr = jax.jit(sr_step, donate_argnums=(0, 1))
    sr_dt = timed_chained(jsr, params_sr, opt_sr, feats, ap, n=20, warmup=3)

    # + the round-3 lean factored optimizer (quality-gated on the Linear
    # headline, BASELINE.md "optimizer gate"): the 308M-param head update
    # is the same HBM-bound class
    tx_af, _ = make_optimizer(
        DictConfig({"optimizer": {"lr": 1e-4, "name": "adafactor",
                                  "param_scale": False, "clipping": None,
                                  "param_dtype": "bfloat16_sr"}}),
        9000, frozen_paths=model.frozen_param_paths())
    params_af = jax.tree.map(
        lambda p: (p.astype(jnp.bfloat16)
                   if p.dtype == jnp.float32 and p.size >= (1 << 16)
                   else p), model.init(jax.random.PRNGKey(0), video[:1]))
    opt_af = tx_af.init(params_af)

    def af_step(params, opt_state, feats, ap):
        loss, grads = jax.value_and_grad(
            lambda p: poisson_nll_mean(head(p, feats), ap))(params)
        updates, opt_state = tx_af.update(grads, opt_state, params)
        return (apply_updates_sr(params, updates, jnp.uint32(7)),
                opt_state, loss)

    jaf = jax.jit(af_step, donate_argnums=(0, 1))
    af_dt = timed_chained(jaf, params_af, opt_af, feats, ap, n=20, warmup=3)

    # reference-style full-recompute step (backbone re-run, unmasked AdamW)
    tx_full = optax.adamw(1e-4, weight_decay=0.01)
    params2 = model.init(jax.random.PRNGKey(0), video[:1])
    opt_full = tx_full.init(params2)

    def full_step(params, opt_state, video, ap):
        loss, grads = jax.value_and_grad(
            lambda p: poisson_nll_mean(model.apply(p, video), ap))(params)
        updates, opt_state = tx_full.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jfull = jax.jit(full_step, donate_argnums=(0, 1))
    full_dt = timed_chained(jfull, params2, opt_full, video, ap,
                            n=10, warmup=3)

    return {"workload": "videomae_probe_step", "batch": B,
            "ms_per_step": round(dt * 1e3, 2),
            "frames_per_s": round(B * 120 / dt, 1),
            "sr_ms_per_step": round(sr_dt * 1e3, 2),
            "adafactor_sr_ms_per_step": round(af_dt * 1e3, 2),
            "encode_once_ms_per_batch": round(enc_dt * 1e3, 2),
            "full_recompute_ms": round(full_dt * 1e3, 2)}


def bench_cebra(rng):
    """CEBRA offset10 fit at the reference recipe scale
    (/root/reference/src/utils/utils.py:306-330: 5000 iterations, batch
    512) on a session of whisker-crop frames (60k timesteps x 40x40)."""
    from video_spike_tpu.models.cebra import CEBRA
    X = rng.normal(size=(60_000, 1600)).astype(np.float32)
    times = []
    for seed in range(2):   # cold (incl. compile) then warm (per-session
        t0 = time.perf_counter()   # cost in a multi-session sweep)
        model = CEBRA(output_dimension=3, max_iterations=5000,
                      batch_size=512, seed=seed)
        model.fit(X)
        times.append(time.perf_counter() - t0)
        assert np.isfinite(model.losses_[-1])
    return {"workload": "cebra_fit_5000it_60000x1600",
            "cold_seconds": round(times[0], 1),
            "warm_seconds": round(times[1], 1),
            "note": "whole fit is one lax.scan program; reference cebra "
                    "runs this per session"}


def bench_metrics(rng):
    from video_spike_tpu.ops.metrics import bits_per_spike_per_neuron
    spikes = jnp.asarray(rng.poisson(1.0, (70, 100, 668)).astype(np.float32))
    rates = jnp.clip(spikes + 0.1, 0.01, None)
    f = jax.jit(bits_per_spike_per_neuron)
    dt = timed(f, rates, spikes)
    return {"workload": "bps_all_neurons_eval", "shape": "70x100x668",
            "ms": round(dt * 1e3, 3)}


def bench_rrr(rng):
    from video_spike_tpu.models.rrr import train_model_main
    K, T, C, N = 500, 100, 7, 668
    X = rng.normal(size=(K, T, C))
    y = rng.normal(size=(K, T, N))
    data = {"e": {"X": [X, X[:50]], "y": [y, y[:50]], "setup": {}}}
    t0 = time.perf_counter()
    train_model_main(data, l2=100.0, n_comp=3, save=False)  # ALS default
    dt_als = time.perf_counter() - t0
    t0 = time.perf_counter()
    train_model_main(data, l2=100.0, n_comp=3, save=False, max_iter=120,
                     solver="lbfgs")
    dt_lbfgs = time.perf_counter() - t0
    return {"workload": "rrr_fit_500x100x668",
            "als_seconds": round(dt_als, 1),
            "lbfgs_seconds": round(dt_lbfgs, 1),
            "note": "incl. compile; ALS is the production solver"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip", nargs="*", default=[])
    args = parser.parse_args()
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    rng = np.random.default_rng(0)
    benches = {"linear_video": bench_linear_video, "vtt": bench_vtt,
               "ssl_base": bench_ssl_base,
               "ssl_turbo": lambda rng: bench_ssl_base(rng, turbo=True),
               "videomae_probe": bench_videomae_probe,
               "cebra": bench_cebra,
               "metrics": bench_metrics, "rrr": bench_rrr}
    for name, fn in benches.items():
        if name in args.skip:
            continue
        try:
            print(json.dumps(fn(rng)), flush=True)
        except Exception as e:  # keep the suite going
            print(json.dumps({"workload": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()

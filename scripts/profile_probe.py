"""Component profile of the VideoMAE probe train step (frozen ViT-Base
backbone + trainable readout; reference /root/reference/src/model/videomae.py).

Splits the 130 ms step (bench_suite videomae_probe) into: frame
preprocess (16-of-120 select + 224 resize + normalize), backbone forward,
head fwd+bwd, and the AdamW update over the 308M-param encoder head.
Chained timing, one device_get barrier (CLAUDE.md tunnel rules).

    python scripts/profile_probe.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def chained(step, carry0, xs_const, iters=10):
    def body(carry, _):
        return step(carry, *xs_const), None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    out = run(carry0)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # real barrier
    t0 = time.time()
    out = run(out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.time() - t0) / iters


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    from video_spike_tpu.models.videomae import (VideoMAEBackbone,
                                                 VideoMAEProbe,
                                                 preprocess_frames)
    from video_spike_tpu.ops.poisson import poisson_nll_mean

    B, N = int(os.environ.get("PROBE_BATCH", 8)), 436
    cfg = {"image_size": 224, "patch_size": 16, "num_channels": 3,
           "num_frames": 16, "tubelet_size": 2, "hidden_size": 768,
           "num_hidden_layers": 12, "num_attention_heads": 12,
           "intermediate_size": 3072, "hf_compat": True,
           "freeze_backbone": True, "pretrained_backbone": None,
           "encoder": {"output_dim": 256}, "decoder": {"output_dim": 100 * N}}
    model = VideoMAEProbe(config=cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.integers(0, 255, (B, 120, 1, 128, 128),
                                     dtype=np.uint8))
    ap = jnp.asarray(rng.poisson(1.0, (B, 100, N)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video[:1])
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt = tx.init(params)
    results = {}

    # full step
    def full_step(carry, video, ap):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(
            lambda p: poisson_nll_mean(model.apply(p, video), ap))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    results["full_step_ms"] = chained(full_step, (params, opt),
                                      (video, ap)) * 1e3

    # preprocess only (chained through a scalar to defeat hoisting)
    def pre_step(carry, video):
        x = preprocess_frames(video + carry.astype(video.dtype), 16, 224,
                              source_frames=120)
        return (jnp.mean(x) * 0).astype(jnp.int32)

    results["preprocess_ms"] = chained(pre_step, jnp.int32(0),
                                       (video,)) * 1e3

    # backbone forward only (pre-processed input held constant)
    bb = VideoMAEBackbone(image_size=224, patch_size=16, num_channels=3,
                          num_frames=16, tubelet_size=2, hidden_size=768,
                          num_hidden_layers=12, num_attention_heads=12,
                          intermediate_size=3072, hf_compat=True,
                          name="video_mae")
    x224 = preprocess_frames(video, 16, 224, source_frames=120)
    bparams = {"params": params["params"]["video_mae"]}

    def bb_step(carry, x):
        p, _ = carry
        h = bb.apply(p, x)
        z = jnp.mean(h) * 0.0
        p = jax.tree.map(lambda a: a + z.astype(a.dtype), p)
        return p, jnp.mean(h).astype(jnp.float32)

    results["backbone_fwd_ms"] = chained(
        bb_step, (bparams, jnp.float32(0)), (x224,)) * 1e3

    # heads fwd+bwd+adam on precomputed hidden states
    hidden = jnp.asarray(rng.normal(size=(B, 1568, 768)).astype(np.float32))
    hp = {"params": {k: params["params"][k]
                     for k in ("encoder_head", "decoder_head")}}
    htx = optax.adamw(1e-4, weight_decay=0.01)
    hopt = htx.init(hp)

    import flax.linen as nn

    class Heads(nn.Module):
        @nn.compact
        def __call__(self, h):
            flat = h.reshape(h.shape[0], -1)
            x = nn.Dense(256, name="encoder_head")(flat)
            x = nn.Dense(100 * N, name="decoder_head")(x)
            return x.reshape(h.shape[0], 100, N)

    hm = Heads()

    def head_step(carry, hidden, ap):
        p, opt_state = carry
        loss, grads = jax.value_and_grad(
            lambda p: poisson_nll_mean(hm.apply(p, hidden), ap))(p)
        updates, opt_state = htx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state

    results["heads_step_ms"] = chained(head_step, (hp, hopt),
                                       (hidden, ap)) * 1e3

    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    results["params_m"] = n / 1e6
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


def depth_slope():
    """Isolate per-layer vs fixed cost of the backbone forward, and the
    hf_compat (f32 LN + erf GELU) tax, at the probe shape."""
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    from video_spike_tpu.models.videomae import (VideoMAEBackbone,
                                                 preprocess_frames)
    B = int(os.environ.get("PROBE_BATCH", 8))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.integers(0, 255, (B, 120, 1, 128, 128),
                                     dtype=np.uint8))
    x224 = preprocess_frames(video, 16, 224, source_frames=120)
    out = {}
    for name, depth, hf in (("hf_d12", 12, True), ("hf_d4", 4, True),
                            ("native_d12", 12, False)):
        bb = VideoMAEBackbone(image_size=224, patch_size=16, num_channels=3,
                              num_frames=16, tubelet_size=2, hidden_size=768,
                              num_hidden_layers=depth,
                              num_attention_heads=12,
                              intermediate_size=3072, hf_compat=hf,
                              name="video_mae")
        p = bb.init(jax.random.PRNGKey(0), x224[:1])

        def bb_step(carry, x):
            p, _ = carry
            h = bb.apply(p, x)
            z = jnp.mean(h) * 0.0
            p = jax.tree.map(lambda a: a + z.astype(a.dtype), p)
            return p, jnp.mean(h).astype(jnp.float32)

        out[name] = round(chained(bb_step, (p, jnp.float32(0)),
                                  (x224,)) * 1e3, 2)
        print(json.dumps({name: out[name]}), flush=True)
    per_layer = (out["hf_d12"] - out["hf_d4"]) / 8
    print(json.dumps({"per_layer_ms": round(per_layer, 2),
                      "fixed_ms": round(out["hf_d12"] - 12 * per_layer, 2),
                      "hf_tax_ms": round(out["hf_d12"] - out["native_d12"],
                                         2)}))


if __name__ == "__main__":
    if os.environ.get("PROBE_DEPTH_SLOPE"):
        depth_slope()
    else:
        main()

"""Measure the ``remat: true`` trade at the SSL recipe shape (ViT-Base,
144 px, batch 128 triplets = 384 frames/step) on the real chip.

Two readings per variant:
- compiled peak HBM of ONE train step (XLA ``memory_analysis`` — temp
  buffers are where the O(depth) activation stash lives), and
- chained-scan step time (same harness rules as scripts/profile_ssl.py:
  feed step N's outputs to N+1, one device_get barrier at the end).

The knob exists for shapes PAST the recipe (bigger batch / longer video /
deeper models); this records what it costs and saves at the recipe point,
plus the largest batch that compiles under the 16 GB v5e HBM either way.
Results land in BASELINE.md ("remat" section).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

BASE = dict(image_size=144, patch_size=16, num_channels=1,
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, decoder_hidden_size=512,
            decoder_num_hidden_layers=8, decoder_num_attention_heads=16,
            decoder_intermediate_size=2048, mask_ratio=0.75,
            norm_pix_loss=False, embed_size=3)


def _build(cfg, batch):
    from video_spike_tpu.models.vit_mae import ContrastViTMAE
    from video_spike_tpu.data.contrast import device_frame_transform
    from video_spike_tpu.ops.contrastive import loss_fn_

    model = ContrastViTMAE(config=cfg)
    rng = np.random.default_rng(0)
    trip = jnp.asarray(rng.integers(0, 255, (3 * batch, 1, 106, 160),
                                    dtype=np.uint8))
    x0 = device_frame_transform(trip[:1], 144)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "masking": jax.random.PRNGKey(1)}, x0)
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt = tx.init(params)

    def step(params, opt_state, key, triplet):
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

    return step, (params, opt, jax.random.PRNGKey(2)), trip


def peak_hbm_gb(remat: bool, batch: int):
    """Compiled peak-memory estimate of one (non-donated) train step."""
    step, carry, trip = _build(dict(BASE, remat=remat), batch)
    lowered = jax.jit(step).lower(*carry, trip)
    try:
        mem = lowered.compile().memory_analysis()
        if mem is None:
            return None
        return {"temp_gb": mem.temp_size_in_bytes / 1e9,
                "args_gb": mem.argument_size_in_bytes / 1e9,
                "out_gb": mem.output_size_in_bytes / 1e9,
                "peak_gb": (mem.temp_size_in_bytes
                            + mem.argument_size_in_bytes
                            + mem.output_size_in_bytes) / 1e9}
    except Exception as e:  # memory_analysis availability varies by runtime
        return {"error": str(e)}


def step_time_ms(remat: bool, batch: int, iters: int = 10):
    step, carry, trip = _build(dict(BASE, remat=remat), batch)

    def body(c, _):
        return step(*c, trip), None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    out = run(carry)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # real barrier
    t0 = time.time()
    out = run(out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.time() - t0) / iters * 1e3


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    res = {}
    for remat in (False, True):
        tag = "remat" if remat else "plain"
        res[f"{tag}_peak"] = peak_hbm_gb(remat, 128)
        print(tag, "peak:", json.dumps(res[f"{tag}_peak"]), flush=True)
        res[f"{tag}_ms"] = step_time_ms(remat, 128)
        print(tag, f"step: {res[f'{tag}_ms']:.1f} ms", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

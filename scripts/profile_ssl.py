"""Component profile of the SSL ContrastViTMAE train step (ViT-Base, 144 px,
batch 128 triplets = 384 frames), chained-scan timing on the real chip.

Splits the step by depth-slope ablation: the same recipe with decoder depth
8→1 isolates the per-decoder-layer cost, encoder depth 12→4 the
per-encoder-layer cost (identical masking, loss, and optimizer in every
variant). Reports a FLOP-based MFU estimate: the MAE encoder sees only the
22 visible tokens (75% mask + cls) while the decoder runs all 82.
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
B = 128


def step_time(cfg, iters=10):
    from video_spike_tpu.models.vit_mae import ContrastViTMAE
    from video_spike_tpu.data.contrast import device_frame_transform
    from video_spike_tpu.ops.contrastive import loss_fn_

    model = ContrastViTMAE(config=cfg)
    rng = np.random.default_rng(0)
    trip = jnp.asarray(rng.integers(0, 255, (3 * B, 1, 106, 160),
                                    dtype=np.uint8))
    x0 = device_frame_transform(trip[:1], 144)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "masking": jax.random.PRNGKey(1)}, x0)
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt = tx.init(params)

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

    def body(carry, _):
        return step(carry, trip), None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    out = run((params, opt, jax.random.PRNGKey(2)))
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # real barrier
    # (device_get); block_until_ready can return early on this runtime
    t0 = time.time()
    out = run(out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.time() - t0) / iters


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()

    base_dt = step_time(BASE)
    dec1 = dict(BASE, decoder_num_hidden_layers=1)
    enc4 = dict(BASE, num_hidden_layers=4)
    dec1_dt = step_time(dec1)
    enc4_dt = step_time(enc4)

    per_dec = (base_dt - dec1_dt) / 7
    per_enc = (base_dt - enc4_dt) / 8
    rest = base_dt - 8 * per_dec - 12 * per_enc

    S_vis, S_full = 22, 82
    D, Dm, Dd, Ddm = 768, 3072, 512, 2048
    enc_flops = 12 * (8 * S_vis * D * D + 4 * S_vis * S_vis * D
                      + 4 * S_vis * D * Dm)
    dec_flops = 8 * (8 * S_full * Dd * Dd + 4 * S_full * S_full * Dd
                     + 4 * S_full * Dd * Ddm)
    tr_flops = 3 * 3 * B * (enc_flops + dec_flops)

    print(json.dumps({
        "full_step_ms": round(base_dt * 1e3, 2),
        "frames_per_s": round(3 * B / base_dt, 1),
        "per_encoder_layer_ms": round(per_enc * 1e3, 3),
        "per_decoder_layer_ms": round(per_dec * 1e3, 3),
        "encoder_total_ms": round(12 * per_enc * 1e3, 2),
        "decoder_total_ms": round(8 * per_dec * 1e3, 2),
        "other_ms": round(rest * 1e3, 2),
        "train_tflops_per_step": round(tr_flops / 1e12, 3),
        "mfu_pct": round(tr_flops / (base_dt * 197e12) * 100, 2),
    }))


if __name__ == "__main__":
    main()

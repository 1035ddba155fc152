"""Head-width sweep for the SSL ContrastViTMAE step (round-3 follow-up to
the VTT shape sweep, BASELINE.md "VTT shape sweep").

The VTT sweep showed 64-wide attention heads under-fill the 128x128 MXU
and that head *width* at fixed hidden size is a quality-free throughput
lever. The SSL recipe (reference ViT-Base MAE,
/root/reference/config/model/vit_mae/vit_mae.yaml) runs 12x64-wide
encoder heads and 16x32-wide decoder heads — the decoder is 60% of the
133.9 ms step (BASELINE.md "SSL ViT-Base step profile"). This sweep times
the full train step with fewer/wider heads at identical
FLOPs/params/capacity; promising variants are then quality-gated at the
5000-step pretrain protocol (nested-RRR val_bps), same standard as the
VTT sweep.

    python scripts/sweep_ssl_heads.py
"""

from __future__ import annotations

import json
import os

from profile_ssl import BASE, B, step_time

# name -> overrides on the reference ViT-Base MAE config
VARIANTS = {
    "s0_base":   {},                                # 12x64 enc, 16x32 dec
    "s1_dec4":   dict(decoder_num_attention_heads=4),    # dec heads 128-wide
    "s2_dec2":   dict(decoder_num_attention_heads=2),    # dec heads 256-wide
    "s3_enc6":   dict(num_attention_heads=6),            # enc heads 128-wide
    "s4_both":   dict(num_attention_heads=6,
                      decoder_num_attention_heads=4),
    "s5_wide":   dict(num_attention_heads=3,
                      decoder_num_attention_heads=2),    # 256-wide both
}


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()

    only = os.environ.get("SSL_SWEEP_ONLY")
    results = {}
    for name, overrides in VARIANTS.items():
        if only and name != only:
            continue
        cfg = dict(BASE, **overrides)
        dt = step_time(cfg)
        results[name] = {"step_ms": round(dt * 1e3, 2),
                         "frames_per_s": round(3 * B / dt, 1)}
        print(json.dumps({"variant": name, **results[name]}), flush=True)


if __name__ == "__main__":
    main()

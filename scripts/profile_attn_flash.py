"""A/B the production einsum attention vs the Pallas TPU flash kernel at
the VideoMAE-probe backbone shape (B=8, S=1568, H=12, D=64, bf16).

Motivation: the probe's backbone forward is 113.8 of 131 ms
(scripts/profile_probe.py) and at S=1568 the materialized f32 score
tensor is 8*12*1568*1568*4 B = 944 MB per layer — the einsum layout that
won at S<=256 (ops/attention.py) is HBM-bound here. Flash attention never
materializes scores. Chained timing, one device_get barrier (CLAUDE.md).

    python scripts/profile_attn_flash.py            # fwd only (frozen path)
    ATTN_BWD=1 python scripts/profile_attn_flash.py # fwd+bwd
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def chained(fn, x0, iters=10):
    """Time fn chained through its own output (qkv += eps * out)."""

    def body(qkv, _):
        out = fn(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        return qkv + (1e-6 * out[:, :, None]).astype(qkv.dtype), None

    run = jax.jit(lambda q: jax.lax.scan(body, q, None, length=iters)[0])
    out = run(x0)
    _ = float(out.reshape(-1)[0])
    t0 = time.time()
    out = run(out)
    _ = float(out.reshape(-1)[0])
    return (time.time() - t0) / iters


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    from video_spike_tpu.ops.attention import attention_bshd

    B, S, H, D = (int(os.environ.get(k, d)) for k, d in
                  (("ATTN_B", 8), ("ATTN_S", 1568), ("ATTN_H", 12),
                   ("ATTN_D", 64)))
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, S, 3, H, D)).astype(np.float32),
                      dtype=jnp.bfloat16)

    bwd = bool(os.environ.get("ATTN_BWD"))

    def wrap(fn):
        if not bwd:
            return fn

        def fwd_bwd(q, k, v):
            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
            g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return g[0] + g[1] + g[2]
        return fwd_bwd

    results = {"shape": f"B{B} S{S} H{H} D{D} bwd={int(bwd)}"}

    # 1. production einsum layout (ops/attention.py)
    results["einsum_ms"] = round(chained(wrap(attention_bshd), qkv) * 1e3, 3)
    print(json.dumps(results), flush=True)

    # 2. pallas flash kernel; (B,S,H,D)->(B,H,S,D) transposes and the
    #    pad-to-128-multiple (kernel block requirement) + segment-id masking
    #    of the pad keys are all included in the measurement
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    def make_flash(Sp, blk_q, blk_k):
        sizes = fa.BlockSizes(
            block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
            block_q_major_dkv=blk_q, block_k_major_dkv=blk_k,
            block_k_dkv=blk_k, block_q_dkv=blk_q, block_k_major_dq=blk_k,
            block_k_dq=blk_k, block_q_dq=blk_q)
        seg = jnp.concatenate([jnp.ones((B, S), jnp.int32),
                               jnp.zeros((B, Sp - S), jnp.int32)], axis=1)

        def flash(q, k, v):
            q, k, v = (jnp.transpose(t, (0, 2, 1, 3)) for t in (q, k, v))
            if Sp != S:
                pad = ((0, 0), (0, 0), (0, Sp - S), (0, 0))
                q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
            out = fa.flash_attention(q, k, v, causal=False,
                                     segment_ids=fa.SegmentIds(seg, seg),
                                     sm_scale=1.0 / float(np.sqrt(D)),
                                     block_sizes=sizes)
            return jnp.transpose(out[:, :, :S], (0, 2, 1, 3))
        return flash

    Sp128 = ((S + 127) // 128) * 128
    Sp512 = ((S + 511) // 512) * 512
    configs = [(Sp128, 128, 128), (Sp128, Sp128, 128),
               (Sp512, 512, 512), (Sp512, 256, 256)]
    for Sp, bq, bk in configs:
        key = f"flash_S{Sp}_q{bq}_k{bk}"
        try:
            flash = make_flash(Sp, bq, bk)
            results[key] = round(chained(wrap(flash), qkv) * 1e3, 3)
            ref = attention_bshd(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
            alt = flash(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
            results[key + "_maxdiff"] = round(float(jnp.max(jnp.abs(
                ref.astype(jnp.float32) - alt.astype(jnp.float32)))), 5)
        except Exception as e:  # noqa: BLE001 - report, keep the A/B alive
            results[key + "_err"] = f"{type(e).__name__}: {e}"[:160]
        print(json.dumps(results), flush=True)

    # 3. XLA dot_product_attention (expects (B, S, H, D) directly)
    def xla_dpa(q, k, v):
        return jax.nn.dot_product_attention(q, k, v, implementation="xla")

    results["xla_dpa_ms"] = round(chained(wrap(xla_dpa), qkv) * 1e3, 3)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

"""Component ablation inside the VTT frame encoder (the 72% of the step).

Builds the same 4-block, hidden-256, 64-token stack over the (B*T=960)
frame batch and times fwd+bwd with one component switched at a time, to
attribute the 38 ms measured by scripts/profile_vtt.py. Chained-scan
timing, one sync (CLAUDE.md).
"""

from __future__ import annotations

import json
import time
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def attention(q, k, v, pv_dtype):
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(pv_dtype),
                      v.astype(pv_dtype),
                      preferred_element_type=jnp.float32)


class Block(nn.Module):
    hidden: int = 256
    heads: int = 4
    mlp_dim: int = 512
    dtype: Any = jnp.bfloat16
    use_attn: bool = True
    use_mlp: bool = True
    gelu_exact: bool = True
    ln_dtype: Any = jnp.float32
    pv_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_attn:
            y = nn.LayerNorm(epsilon=1e-12, dtype=self.ln_dtype)(x)
            B, S, _ = y.shape
            hd = self.hidden // self.heads
            qkv = nn.Dense(3 * self.hidden, dtype=self.dtype)(y)
            qkv = qkv.reshape(B, S, 3, self.heads, hd)
            q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3))
                       for i in range(3))
            o = attention(q, k, v, self.pv_dtype)
            o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, S, self.hidden)
            x = x + nn.Dense(self.hidden, dtype=self.dtype)(
                o.astype(self.dtype))
        if self.use_mlp:
            y = nn.LayerNorm(epsilon=1e-12, dtype=self.ln_dtype)(x)
            y = nn.Dense(self.mlp_dim, dtype=self.dtype)(y)
            y = nn.gelu(y, approximate=not self.gelu_exact)
            y = nn.Dense(self.hidden, dtype=self.dtype)(y)
            x = x + y
        return x


class FE(nn.Module):
    variant: dict

    @nn.compact
    def __call__(self, frames):
        x = jnp.transpose(frames, (0, 2, 3, 1)).astype(jnp.bfloat16)
        x = nn.Conv(256, (16, 16), strides=(16, 16), padding="VALID",
                    dtype=jnp.bfloat16)(x)
        n, h, w, d = x.shape
        x = x.reshape(n, h * w, d)
        for _ in range(4):
            x = Block(**self.variant)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        return jnp.mean(x, axis=1)


def timed(variant, frames, iters=20):
    model = FE(variant=variant)
    params = model.init(jax.random.PRNGKey(0), frames[:8])

    def step(p, frames):
        g = jax.grad(lambda p: jnp.mean(model.apply(p, frames) ** 2))(p)
        return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)

    def chain(p):
        return jax.lax.scan(lambda c, _: (step(c, frames), None), p,
                            None, length=iters)[0]

    run = jax.jit(chain)
    out = run(params)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # real barrier
    # (device_get); block_until_ready can return early on this runtime
    t0 = time.time()
    out = run(out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.time() - t0) / iters * 1e3


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(960, 1, 128, 128)).astype(np.float32))

    base = dict(use_attn=True, use_mlp=True, gelu_exact=True,
                ln_dtype=jnp.float32, pv_dtype=jnp.float32)
    variants = {
        "baseline": base,
        "no_attention": {**base, "use_attn": False},
        "no_mlp": {**base, "use_mlp": False},
        "pv_bf16": {**base, "pv_dtype": jnp.bfloat16},
        "gelu_tanh": {**base, "gelu_exact": False},
        "ln_bf16": {**base, "ln_dtype": jnp.bfloat16},
        "all_fast": {**base, "pv_dtype": jnp.bfloat16,
                     "ln_dtype": jnp.bfloat16},
    }
    out = {}
    for name, v in variants.items():
        out[name] = round(timed(v, frames), 2)
        print(f"{name}: {out[name]} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

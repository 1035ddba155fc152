"""A/B the frame-encoder block's LayerNorm dtype at the VTT shapes.

The transformer Block keeps LayerNorm in f32 between bf16 matmuls, which
bounces every activation f32 <-> bf16 (double HBM traffic on a
(61440, 256) stream). This measures the same 4-block encoder with
(a) f32 LNs (production), (b) bf16 LNs (f32 statistics via upcast inside),
both fwd+bwd chained, same process so tunnel-session variance cancels.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def chained(step, carry0, xs_const, iters=20):
    def body(carry, _):
        return step(carry, *xs_const), None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    out = run(carry0)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # real barrier
    # (device_get); block_until_ready can return early on this runtime
    t0 = time.time()
    out = run(out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.time() - t0) / iters


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    from video_spike_tpu.models.vit_mae import Block

    B, S, D = 960, 64, 256   # VTT frame-encoder stream at batch 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))

    class Enc(nn.Module):
        ln_dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x):
            for _ in range(4):
                x = Block(D, 4, 2 * D, ln_dtype=self.ln_dtype)(x)
            return x

    for name, dt in (("f32_ln", jnp.float32), ("bf16_ln", jnp.bfloat16)):
        enc = Enc(ln_dtype=dt)
        params = enc.init(jax.random.PRNGKey(0), x[:1])

        def step(p, x):
            g = jax.grad(lambda p: jnp.mean(
                enc.apply(p, x).astype(jnp.float32) ** 2))(p)
            return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)

        ms = chained(step, params, (x,)) * 1e3
        print(f"{name}: {ms:.2f} ms fwd+bwd over (960, 64, 256) x4 blocks")

    # numerics check: outputs agree to bf16 tolerance
    enc32, enc16 = Enc(jnp.float32), Enc(jnp.bfloat16)
    p = enc32.init(jax.random.PRNGKey(0), x[:1])
    y32 = np.asarray(enc32.apply(p, x[:64]), np.float32)
    y16 = np.asarray(enc16.apply(p, x[:64]), np.float32)
    rel = np.abs(y16 - y32) / (np.abs(y32) + 1e-3)
    print(f"max rel diff bf16 vs f32 LN: {rel.max():.4f} "
          f"(mean {rel.mean():.5f})")


if __name__ == "__main__":
    main()

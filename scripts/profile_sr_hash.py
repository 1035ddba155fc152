"""On-chip A/B: cost of the stochastic-rounding bit generator in the fused
low-rank readout update (the bench.py headline step).

The fused update's HBM traffic is W in + W out = 2 GB (504M bf16 params);
at the v5e's 819 GB/s that is ~2.4 ms, but the measured update is ~4.6 ms —
the gap is VPU work, dominated by the murmur3-finalizer counter hash
(~14 elementwise uint32 ops per element, ops/optim._hash_bits). Packing two
elements per hash cannot help on a SIMD VPU (each lane would still compute
the pair hash), so the lever is a cheaper hash. Arms:

  v0  murmur3 finalizer (shipped)              ~14 ops/elt
  v1  nearest rounding, no bits (LOWER BOUND — not a candidate: biased)
  v2  multiplicative hash: bits = (x*C) >> 16   ~4 ops/elt
  v3  xorshift-mul: x ^= x>>16; x *= C; >> 16   ~6 ops/elt

v2/v3 keep per-element/per-step uniformity of the low 16 bits (for a fixed
element the per-step sequence is a Weyl walk on the hashed counter — still
equidistributed); cross-element correlation within a step is higher than
murmur's, which SR's unbiasedness does not need but the end-to-end quality
gate must confirm (scripts/quality_gate_optimizer.py) before any arm ships.

Timing rules per CLAUDE.md: chained donated steps, ONE device_get barrier,
idle host.  Usage: python scripts/profile_sr_hash.py [v0 v1 v2 v3 ...]

MEASURED (v5e chip, 2026-08-18, full fused step at the production shape):

    v0 murmur (shipped)   6.15 ms/step   312k frames/s
    v1 no bits (bound)    6.11 ms/step   314k frames/s
    v2 mul-hash           6.21 ms/step   309k frames/s
    v3 xorshift-mul       6.22 ms/step   309k frames/s

VERDICT: the bit generator is already hidden behind the HBM stream — the
nearest-rounding lower bound recovers 0.04 ms (0.7%), within run noise, and
the "cheaper" hashes measure no faster. XLA overlaps the VPU hash with the
memory-bound parameter stream, so hash ops are not on the critical path at
this shape. No change shipped; the murmur3 finalizer stays production (best
statistical quality at zero marginal cost).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")
from video_spike_tpu.core.runtime import setup_runtime  # noqa: E402

setup_runtime()

from video_spike_tpu.models.linear import LinearModel          # noqa: E402
from video_spike_tpu.ops.poisson import poisson_nll_mean       # noqa: E402
from video_spike_tpu.ops.optim import apply_updates_sr         # noqa: E402
from video_spike_tpu.ops import fused_readout as fr            # noqa: E402

T_FRAMES, H, W = 120, 128, 128
N_NEURONS = 436
BATCH = 16
N_TRIALS = 64

_LEAF = jnp.uint32(fr._LEAF_CONST)


def _keyed(idx, seed):
    return (idx + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9) + _LEAF)


def bits_murmur(idx, seed):          # v0 — fr._mix_bits
    return fr._mix_bits(idx, seed)


def bits_mul(idx, seed):             # v2
    x = _keyed(idx, seed) * jnp.uint32(0x7FEB352D)
    return x >> 16


def bits_xsmul(idx, seed):           # v3
    x = _keyed(idx, seed)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    return x >> 16


def make_outer(bits_fn):
    """_apply_scaled_outer_xla with a swappable bit generator."""

    def outer(w, xa, dzc, seed):
        upd = jax.lax.dot_general(
            xa, dzc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m, n = w.shape
        if bits_fn is None:          # v1: nearest (bound only)
            return (w.astype(jnp.float32) + upd).astype(jnp.bfloat16)
        rows = jax.lax.broadcasted_iota(jnp.uint32, (m, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.uint32, (m, n), 1)
        bits = bits_fn(rows * jnp.uint32(n) + cols, seed)
        return fr._sr_add_to_bf16(w, upd, bits)

    return outer


def main():
    which = sys.argv[1:] or ["v0", "v1", "v2", "v3"]
    model = LinearModel(encoder_hidden=(256, 128), encoder_out=64,
                        decoder_hidden=(128, 256),
                        output_dim=100 * N_NEURONS)
    rng = np.random.default_rng(0)
    X_all = jax.device_put(rng.integers(
        0, 255, (N_TRIALS, T_FRAMES, 1, H, W), dtype=np.uint8))
    ap_all = jax.device_put(
        rng.poisson(1.0, (N_TRIALS, 100, N_NEURONS)).astype(np.uint8))
    idx = jnp.arange(BATCH, dtype=jnp.int32)
    jax.block_until_ready((X_all, ap_all))
    sched = optax.cosine_onecycle_schedule(10_000, 5e-5)

    arms = {"v0": bits_murmur, "v1": None, "v2": bits_mul, "v3": bits_xsmul}
    orig_outer = fr._apply_scaled_outer_xla
    for tag in which:
        fr._apply_scaled_outer_xla = make_outer(arms[tag])
        try:
            params = jax.tree.map(
                lambda p: (p.astype(jnp.bfloat16)
                           if p.dtype == jnp.float32 and p.size >= (1 << 16)
                           else p),
                model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, T_FRAMES * H * W), jnp.float32)))
            tx_rest = optax.adafactor(
                sched, multiply_by_parameter_scale=False,
                clipping_threshold=None)
            inner = fr.make_fused_linear_step(
                model, tx_rest, sched,
                lambda out, ap, nv: poisson_nll_mean(
                    out, ap.astype(jnp.float32)),
                apply_updates_sr)

            def step(carry, X, A, ix, seed, inner=inner):
                params, opt_state, _ = carry
                x = jnp.take(X, ix, axis=0)
                ap = jnp.take(A, ix, axis=0)
                p, o, loss = inner(params, opt_state, x, ap, BATCH, seed)
                return (p, o, loss)

            jstep = jax.jit(step, donate_argnums=(0,))
            carry = (params, fr.init_fused_opt_state(params, tx_rest),
                     jnp.float32(0))
            for i in range(5):
                carry = jstep(carry, X_all, ap_all, idx, jnp.uint32(i))
            _ = float(jax.tree.leaves(carry)[-1].reshape(-1)[0])
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                for i in range(40):
                    carry = jstep(carry, X_all, ap_all, idx,
                                  jnp.uint32(5 + rep * 40 + i))
                _ = float(jax.tree.leaves(carry)[-1].reshape(-1)[0])
                best = min(best, (time.perf_counter() - t0) / 40)
            print(f"{tag:4s} {best*1e3:7.2f} ms/step  "
                  f"{BATCH*T_FRAMES/best:9.0f} frames/s")
        finally:
            fr._apply_scaled_outer_xla = orig_outer


if __name__ == "__main__":
    main()

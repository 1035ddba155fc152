"""Optimizer variants tuned for HBM-bound updates.

The raw-video Linear readout is ~500M params: its AdamW update moves
~14 GB/step (params + two f32 moments + grads, read and write), which is
the throughput ceiling — compute is <1 ms. `adamw_lowmem` stores BOTH Adam
moments in bfloat16 (optax only supports a bf16 first moment via
``mu_dtype``), computing the update in f32. The second moment is a slowly
varying running average of squared gradients, so bf16's ~3 decimal digits
cost noise well below the gradient noise floor; the bias-correction and
rsqrt still happen in f32.

`adafactor_lean` goes further for the biggest readouts: a factored second
moment (row/col statistics, Adafactor-style) with no full-tensor side
passes — measurements and the 200-epoch quality gate that shipped the
equivalent optax configuration are in BASELINE.md "optimizer gate".
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaleByAdamLowmemState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def scale_by_adam_lowmem(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam scaling with bfloat16 moment storage (f32 math)."""

    def init_fn(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.bfloat16), params)
        nu = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.bfloat16), params)
        return ScaleByAdamLowmemState(jnp.zeros([], jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def upd(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32
            step = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
            return (step.astype(g.dtype), m32.astype(jnp.bfloat16),
                    v32.astype(jnp.bfloat16))

        out = jax.tree.map(upd, updates, state.mu, state.nu)
        # a plain isinstance(tuple) is_leaf would also catch the EMPTY
        # MaskedNode namedtuples optax.masked/multi_transform inject for
        # frozen leaves (make_optimizer frozen_paths) -> t[0] IndexError;
        # those must be traversed as (childless) containers instead
        three = lambda t: isinstance(t, tuple) and len(t) == 3
        steps = jax.tree.map(lambda t: t[0], out, is_leaf=three)
        mu = jax.tree.map(lambda t: t[1], out, is_leaf=three)
        nu = jax.tree.map(lambda t: t[2], out, is_leaf=three)
        return steps, ScaleByAdamLowmemState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_lowmem(learning_rate, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 0.0
                 ) -> optax.GradientTransformation:
    """AdamW with bf16 moment storage: ~4 GB/step less HBM traffic on a
    500M-param model than f32-state optax.adamw."""
    return optax.chain(
        scale_by_adam_lowmem(b1, b2, eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def adamw_sr_bf16(learning_rate, b1: float = 0.9, b2: float = 0.999,
                  eps: float = 1e-8, weight_decay: float = 0.0
                  ) -> optax.GradientTransformation:
    """AdamW over a bfloat16 parameter tree (pair with
    :func:`apply_updates_sr`).

    With bf16 params the gradients are bf16 too, so the whole update chain
    (grads in, moments stored, step out) moves half the HBM traffic of the
    f32-param variant. The moment math still runs in f32
    (:func:`scale_by_adam_lowmem`); the one thing plain
    ``optax.apply_updates`` would get wrong is the parameter add — at
    lr 5e-5 the per-step update is far below bf16's ~0.4% relative
    resolution and round-to-nearest would discard it, which is what
    :func:`apply_updates_sr`'s stochastic rounding fixes.
    """
    return optax.chain(
        scale_by_adam_lowmem(b1, b2, eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def _sr_to_bf16(x32: jax.Array, bits: jax.Array) -> jax.Array:
    """Stochastically round an f32 array to bf16.

    bf16 is the top 16 bits of the f32 pattern: adding a uniform random
    16-bit integer to the low mantissa bits and truncating rounds up with
    probability proportional to the discarded remainder (exactly unbiased
    in expectation; the carry may legitimately bump the exponent). Works on
    the magnitude for negatives (IEEE sign-magnitude), which is the correct
    SR there too.
    """
    raw = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    raw = (raw + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    rounded = jax.lax.bitcast_convert_type(raw, jnp.float32)
    # low bits are zero, so this astype is exact
    return rounded.astype(jnp.bfloat16)


def _hash_bits(seed: jax.Array, leaf_id: int, n: int) -> jax.Array:
    """n uniform uint32s from a murmur3-finalizer counter hash.

    ~5 VPU ops/element vs threefry's dozens (measured 13.4 ms for a
    504M-element draw — as long as the whole update it was randomizing).
    SR only needs low-16 bits that are uniform and uncorrelated with the
    data and across steps; a counter hash keyed by (seed=step, leaf)
    delivers that at streaming speed.
    """
    x = jax.lax.iota(jnp.uint32, n)
    x = x + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9) \
        + jnp.uint32((leaf_id * 0x85EBCA6B) & 0xFFFFFFFF)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def apply_updates_sr(params: optax.Params, updates: optax.Updates,
                     seed: jax.Array) -> optax.Params:
    """``optax.apply_updates`` with stochastic rounding into bf16 leaves.

    The sum is computed in f32. bf16 leaves are stochastically rounded back
    (unbiased, so sub-ulp AdamW steps accumulate across iterations instead
    of rounding away); other dtypes take the ordinary exact add. ``seed``
    is a scalar (pass the step count) — each leaf gets an independent
    stream via a leaf-id offset in the counter hash.
    """
    counter = iter(range(1, 1 << 30))

    def upd(p, u):
        if u is None:
            return p
        s = p.astype(jnp.float32) + u.astype(jnp.float32)
        if p.dtype != jnp.bfloat16:
            return s.astype(p.dtype)
        bits = _hash_bits(seed, next(counter), p.size).reshape(p.shape)
        return _sr_to_bf16(s, bits)

    return jax.tree.map(upd, params, updates,
                        is_leaf=lambda x: x is None)


class FactoredRMSState(NamedTuple):
    count: jax.Array
    row: optax.Updates   # per-leaf row second-moment factor (or full v)
    col: optax.Updates   # per-leaf col factor (None-placeholder if full)


def adafactor_lean(learning_rate, decay_rate: float = 0.8,
                   eps: float = 1e-30, min_factor_dim: int = 128
                   ) -> optax.GradientTransformation:
    """Factored-RMS optimizer tuned for HBM-bound giant readouts.

    Same factored second moment as Adafactor (T5-style time-dependent
    decay 1 - t^-decay_rate, row/col mean-square factors for 2-D leaves
    with both dims >= min_factor_dim; full RMS otherwise), with every
    full-tensor side pass stripped: no parameter-scale pass, no update
    clipping pass, no first moment, and the update is emitted in the
    GRADIENT dtype (bf16 in the production step, halving the update
    write+read vs optax.adafactor's f32) — pair with
    :func:`apply_updates_sr`, which does the parameter add in f32 and
    stochastically rounds into the bf16 store. Measured on the 504M
    headline step in scripts/profile_adafactor.py.
    """
    sched = (learning_rate if callable(learning_rate)
             else (lambda _: learning_rate))

    def factored(p) -> bool:
        return p.ndim == 2 and min(p.shape) >= min_factor_dim

    def init_fn(params):
        def row0(p):
            return (jnp.zeros((p.shape[0],), jnp.float32) if factored(p)
                    else jnp.zeros_like(p, jnp.bfloat16))

        def col0(p):
            return (jnp.zeros((p.shape[1],), jnp.float32) if factored(p)
                    else jnp.zeros((), jnp.float32))  # unused placeholder

        return FactoredRMSState(jnp.zeros([], jnp.int32),
                                jax.tree.map(row0, params),
                                jax.tree.map(col0, params))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        beta = 1.0 - t ** (-decay_rate)   # T5 time-dependent decay
        lr = sched(state.count)

        def upd(g, r, c):
            g32 = g.astype(jnp.float32)
            g2 = g32 * g32 + eps
            if r.ndim == 1 and g.ndim == 2:   # factored 2-D leaf
                r = beta * r + (1 - beta) * jnp.mean(g2, axis=1)
                c = beta * c + (1 - beta) * jnp.mean(g2, axis=0)
                # v_ij ~= r_i c_j / mean(r); rsqrt factors separately so the
                # full v matrix is never materialized in f32
                denom = (jax.lax.rsqrt(r / jnp.mean(r))[:, None]
                         * jax.lax.rsqrt(c)[None, :])
                step = -lr * g32 * denom
                return step.astype(g.dtype), r, c
            v32 = beta * r.astype(jnp.float32) + (1 - beta) * g2
            step = -lr * g32 * jax.lax.rsqrt(v32)
            return step.astype(g.dtype), v32.astype(jnp.bfloat16), c

        out = jax.tree.map(upd, updates, state.row, state.col)
        three = lambda t_: isinstance(t_, tuple) and len(t_) == 3
        steps = jax.tree.map(lambda t_: t_[0], out, is_leaf=three)
        row = jax.tree.map(lambda t_: t_[1], out, is_leaf=three)
        col = jax.tree.map(lambda t_: t_[2], out, is_leaf=three)
        return steps, FactoredRMSState(count, row, col)

    return optax.GradientTransformation(init_fn, update_fn)

"""Fused low-rank update for giant readout layers.

The reference's headline workload trains a Linear readout whose first layer
is ~500M params: input dim 1,966,080 (raw 120x128x128 video) x 256 hidden
(``/root/reference/config/model/linear_video.yaml:6``; our
``models/linear.py``). At batch B=16 that layer's gradient is rank-B:

    G = x^T @ dz            x: (B, M) inputs, dz: (B, N) pre-activation grads

so materializing G (1 GB bf16 / 2 GB f32 per step) is pure HBM waste — the
measured step is bandwidth-bound (BASELINE.md "Step time breakdown"). This
module computes the production optimizer step (``ops/optim.adafactor_lean``
numerics + stochastically rounded bf16 parameter store) directly from the
rank-B factors:

1. Both factored second-moment statistics have closed forms that never
   touch an (M, N) tensor:

       rowsum_n(G^2)[m] = x[:,m]^T (dz dz^T) x[:,m]                  O(B^2 M)
       colsum_m(G^2)[n] = dz[:,n]^T (x x^T) dz[:,n]                  O(B^2 N)

   evaluated in cancellation-free sum-of-squares form — eigh the tiny
   (B, B) PSD factor and square (sqrt(L) Q^T) @ x (see
   lowrank_row_col_sq for why the naive mixed-sign einsum NaN'd at
   production scale).

2. The scaled update itself is one matmul: with row scale a = rsqrt(r/mean r)
   and col scale c = -lr * rsqrt(v_col),

       diag(a) @ G @ diag(c) = (x * a)^T @ (dz * c)

   so the parameter write W_new = SR(W + (x*a)^T @ (dz*c)) streams W once in
   and once out — nothing else at O(M*N). A Pallas kernel fuses the tile
   matmul, the add, and the stochastic rounding so the f32 matmul result is
   never spilled to HBM either (the pure-XLA fallback materializes it).

Per-step HBM traffic on the 504M layer drops from ~6 GB (grad write + grad
read for stats + update write + update read + param read + param write) to
~2.1 GB (param read + param write) — the forward pass adds its one
unavoidable read of W.

Numerics: matches ``adafactor_lean`` fed an *exact f32* gradient to within
f32 rounding (the statistics route differs but is the more accurate one) —
tighter than the shipped materialized path, whose G and update are
round-tripped through bf16. Quality-gated end-to-end like every optimizer
change at full production scale and across seeds
(scripts/quality_gate_optimizer.py --suite linear|probe; BASELINE.md
"optimizer gate" and "fused low-rank readout update").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# distinct leaf constant so the SR bit-stream cannot collide with
# ops/optim.apply_updates_sr's small leaf ids (which use leaf_id * 0x85EBCA6B
# for leaf_id = 1, 2, ...)
_LEAF_CONST = (999983 * 0x85EBCA6B) & 0xFFFFFFFF


class FusedReadoutState(NamedTuple):
    """Adafactor-lean factored second moment for one (M, N) kernel."""
    count: jax.Array   # scalar int32 step counter
    row: jax.Array     # (M,) f32 row mean-square EMA
    col: jax.Array     # (N,) f32 col mean-square EMA


def init_fused_state(kernel: jax.Array) -> FusedReadoutState:
    m, n = kernel.shape
    return FusedReadoutState(jnp.zeros([], jnp.int32),
                             jnp.zeros((m,), jnp.float32),
                             jnp.zeros((n,), jnp.float32))


def _psd_sqrt_t(k: jax.Array) -> jax.Array:
    """sqrt(Λ) Qᵀ of a tiny (B, B) PSD matrix, eigenvalues clamped >= 0."""
    lam, q = jnp.linalg.eigh(k)
    return jnp.sqrt(jnp.maximum(lam, 0.0))[:, None] * q.T


def lowrank_row_col_sq(x: jax.Array, dz: jax.Array):
    """(rowsum_n G^2, colsum_m G^2) of G = x^T @ dz, without forming G.

    ``x``: (B, M), ``dz``: (B, N); f32 math regardless of input dtypes.

    Numerics: row_sq[m] = x[:,m]ᵀ (dz dzᵀ) x[:,m] is a PSD quadratic form,
    but evaluating it as Σ_b ((dz dzᵀ) x)[b,m] · x[b,m] sums B mixed-sign
    products whose f32 cancellation error is *absolute* (∝ the largest
    intermediate). At the production probe-head scale (M=1.2M,
    intermediates ~1e6) rows whose true value is below the ~1e1 noise
    floor came out negative (-34 observed), and the resulting rsqrt either
    NaN'd or amplified that row's update by ~1e14x. Instead factor the
    tiny (B, B) PSD matrix as (√Λ Qᵀ)ᵀ(√Λ Qᵀ) and return
    Σ_b ((√Λ Qᵀ) x)[b,m]² — a sum of squares, non-negative by
    construction, with *relative* rounding error and rank-deficiency safe
    (duplicate padded batch rows make dz dzᵀ singular; clamped eigenvalues
    handle it). Cost: one B×B eigh (B ≤ 32) + the same O(B²·(M+N))
    matmuls as before.
    """
    xf = x.astype(jnp.float32)
    dzf = dz.astype(jnp.float32)
    z = _psd_sqrt_t(dzf @ dzf.T) @ xf                # (B, M)
    row_sq = jnp.einsum("bm,bm->m", z, z)            # (M,)
    w = _psd_sqrt_t(xf @ xf.T) @ dzf                 # (B, N)
    col_sq = jnp.einsum("bn,bn->n", w, w)            # (N,)
    return row_sq, col_sq


def _mix_bits(idx_u32: jax.Array, seed: jax.Array) -> jax.Array:
    """murmur3-finalizer counter hash over absolute element indices.

    Same construction (and cost: ~5 VPU ops/elt) as ops/optim._hash_bits,
    keyed by the kernel's flat element index so the Pallas tiles and the
    pure-XLA fallback draw bit-identical streams.
    """
    x = idx_u32 + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9) \
        + jnp.uint32(_LEAF_CONST)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _sr_add_to_bf16(w_bf16: jax.Array, upd32: jax.Array,
                    bits: jax.Array) -> jax.Array:
    """SR(w + upd) into bf16 (same rounding as ops/optim._sr_to_bf16)."""
    s = w_bf16.astype(jnp.float32) + upd32
    raw = jax.lax.bitcast_convert_type(s, jnp.uint32)
    raw = (raw + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(raw, jnp.float32).astype(jnp.bfloat16)


def _apply_scaled_outer_xla(w, xa, dzc, seed):
    """W += xa^T @ dzc with SR, letting XLA schedule (materializes the f32
    matmul product; the Pallas path avoids that)."""
    upd = jax.lax.dot_general(
        xa, dzc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (M, N)
    if w.dtype != jnp.bfloat16:
        return (w.astype(jnp.float32) + upd).astype(w.dtype)
    m, n = w.shape
    rows = jax.lax.broadcasted_iota(jnp.uint32, (m, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (m, n), 1)
    bits = _mix_bits(rows * jnp.uint32(n) + cols, seed)
    return _sr_add_to_bf16(w, upd, bits)


def _pick_tile(m: int) -> int | None:
    for tm in (1024, 2048, 512, 768, 384, 256, 128, 64, 32, 16, 8):
        if m % tm == 0:
            return tm
    return None


def _fused_kernel(seed_ref, w_ref, xa_ref, dzc_ref, out_ref):
    i = pl.program_id(0)
    upd = jnp.dot(xa_ref[...], dzc_ref[...],
                  preferred_element_type=jnp.float32)
    tm, n = out_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.uint32, (tm, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (tm, n), 1)
    flat = (rows + jnp.uint32(tm) * i.astype(jnp.uint32)) * jnp.uint32(n) \
        + cols
    bits = _mix_bits(flat, seed_ref[0, 0])
    out_ref[...] = _sr_add_to_bf16(w_ref[...], upd, bits)


def _apply_scaled_outer_pallas(w, xa, dzc, seed, interpret=False):
    """Tiled W-stream update: per M-tile, one (TM,B)@(B,N) MXU matmul + add
    + stochastic round, so HBM sees only W in / W out.

    A/B-harness contract: bf16 kernels with M divisible by 8 only (the
    kernel fuses the SR-to-bf16 write; the XLA path handles everything)."""
    m, n = w.shape
    tm = _pick_tile(m)
    if w.dtype != jnp.bfloat16 or tm is None:
        raise ValueError(
            f"use_pallas=True supports bf16 kernels with M divisible by 8; "
            f"got dtype={w.dtype}, shape={(m, n)} — use the XLA path "
            f"(use_pallas=False), which preserves the kernel dtype")
    xat = xa.T                                        # (M, B) f32
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape(1, 1)
    return pl.pallas_call(
        _fused_kernel,
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, xat.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dzc.shape[0], n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        interpret=interpret,
    )(seed_arr, w, xat, dzc)


def fused_readout_update(kernel: jax.Array, x: jax.Array, dz: jax.Array,
                         state: FusedReadoutState, lr,
                         *, decay_rate: float = 0.8, eps: float = 1e-30,
                         seed: jax.Array,
                         use_pallas: bool | None = None,
                         interpret: bool = False):
    """One adafactor_lean step on ``kernel`` from the rank-B grad factors.

    Matches ``ops/optim.adafactor_lean`` (T5 time-dependent decay
    ``1 - t^-0.8``, factored rsqrt scaling, ``-lr`` step) followed by
    ``apply_updates_sr``'s f32 add + stochastic rounding for bf16 kernels —
    with the gradient kept in exact-f32 factored form throughout.

    ``lr`` may be a scalar or a schedule (called with the pre-increment
    count, like ``adafactor_lean``).
    """
    count = state.count + 1
    t = count.astype(jnp.float32)
    beta = 1.0 - t ** (-decay_rate)
    lr_t = lr(state.count) if callable(lr) else lr
    m, n = kernel.shape

    row_sq, col_sq = lowrank_row_col_sq(x, dz)
    # defense in depth vs the roundoff-negative failure mode documented in
    # lowrank_row_col_sq (a harmless no-op for its sum-of-squares output,
    # load-bearing for any alternative stats implementation)
    row_sq = jnp.maximum(row_sq, 0.0)
    col_sq = jnp.maximum(col_sq, 0.0)
    # matches mean(g*g + eps, axis) on an exact-f32 G
    r = beta * state.row + (1.0 - beta) * (row_sq / n + eps)
    c = beta * state.col + (1.0 - beta) * (col_sq / m + eps)

    # bound the per-row amplification: a row whose statistic underflows
    # relative to the mean must not have its (equally roundoff-dominated)
    # update row amplified without limit — 1e-12 caps a at 1e6x, far above
    # any healthy row's scale and far below the 1e14x that overflowed the
    # exp() link when a cancelled statistic met a non-cancelled update row
    a = jax.lax.rsqrt(jnp.maximum(r / jnp.mean(r), 1e-12))   # (M,)
    b = jax.lax.rsqrt(c) * (-lr_t)                   # (N,)
    xa = x.astype(jnp.float32) * a[None, :]          # (B, M)
    dzc = dz.astype(jnp.float32) * b[None, :]        # (B, N)

    if use_pallas is None:
        # Measured at the production 504M shape on the v5e chip (update
        # alone, chained timing): XLA 4.60 ms vs Pallas 14.35 ms at the
        # initial (tm=1024, parallel-sem) config, 5.86 ms with tm=4096 +
        # arbitrary semantics + input/output aliasing, and 6.95 ms using
        # the hardware prng + pltpu.stochastic_round. XLA's dot-epilogue
        # fusion beats the hand-tiled kernel on every variant (same
        # pattern as the retired round-1 kernels, ops/pallas/__init__.py),
        # so the XLA path is the production default; the kernel stays for
        # the record and as an A/B harness (use_pallas=True).
        use_pallas = False
    if use_pallas:
        new_kernel = _apply_scaled_outer_pallas(kernel, xa, dzc, seed,
                                                interpret=interpret)
    else:
        new_kernel = _apply_scaled_outer_xla(kernel, xa, dzc, seed)
    return new_kernel, FusedReadoutState(count, r, c)


# ---------------------------------------------------------------------------
# LinearModel integration: forward split at the first (giant) Dense
# ---------------------------------------------------------------------------

FIRST_DENSE = ("params", "encoder", "Dense_0")


def preprocess_flat(model, x: jax.Array) -> jax.Array:
    """The LinearModel input path before the first Dense (models/linear.py:
    uint8 -> [0,1] scale, flatten, compute-dtype cast)."""
    b = x.shape[0]
    if x.dtype == jnp.uint8:
        x = x.astype(model.compute_dtype) / 255.0
    return x.reshape(b, -1).astype(model.compute_dtype)


def _dense(h, p, dtype):
    return (h.astype(dtype) @ p["kernel"].astype(dtype)
            + p["bias"].astype(dtype))


def tail_apply(model, params, z1: jax.Array) -> jax.Array:
    """Apply everything after ``z1 = flat @ W1 + b1`` (pre-ReLU first-Dense
    output), mirroring LinearModel.__call__ layer for layer. ``params`` may
    or may not contain the first Dense kernel — only later layers are read.
    """
    cd = model.compute_dtype
    b = z1.shape[0]
    enc = params["params"]["encoder"]
    dec = params["params"]["decoder"]
    h = jax.nn.relu(z1)
    n_enc = len(model.encoder_hidden)
    for idx in range(1, n_enc):
        h = jax.nn.relu(_dense(h, enc[f"Dense_{idx}"], cd))
    h = _dense(h, enc[f"Dense_{n_enc}"], cd)         # encoder head, no relu
    for idx in range(len(model.decoder_hidden)):
        h = jax.nn.relu(_dense(h, dec[f"Dense_{idx}"], cd))
    h = _dense(h, dec[f"Dense_{len(model.decoder_hidden)}"], cd)
    h = h.astype(jnp.float32)
    return h.reshape(b, model.t_bins, model.output_dim // model.t_bins)


def split_first_kernel(params):
    """(kernel, params-without-that-leaf). Plain-dict surgery, trace-time
    free; the bias stays in the tree (its grad flows through dz)."""
    kernel = params["params"]["encoder"]["Dense_0"]["kernel"]
    rest = {**params,
            "params": {**params["params"],
                       "encoder": {**params["params"]["encoder"],
                                   "Dense_0": {
                "bias": params["params"]["encoder"]["Dense_0"]["bias"]}}}}
    return kernel, rest


def merge_first_kernel(rest, kernel):
    return {**rest,
            "params": {**rest["params"],
                       "encoder": {**rest["params"]["encoder"],
                                   "Dense_0": {
                "bias": rest["params"]["encoder"]["Dense_0"]["bias"],
                "kernel": kernel}}}}


def make_fused_linear_step(model, tx_rest, schedule, criterion,
                           apply_updates_rest, *, use_pallas=None,
                           interpret=False):
    """Build ``step(params, opt_state, inputs, ap, n_valid, seed)`` with the
    first-Dense update fused (rank-B factors, no materialized gradient) and
    every other leaf on ``tx_rest``.

    ``opt_state`` is ``(FusedReadoutState, tx_rest state)``; use
    :func:`init_fused_opt_state`. The returned step has the same call
    signature as BaseTrainer's standard train_step.
    """

    def step(params, opt_state, inputs, ap, n_valid, seed):
        fstate, rest_state = opt_state
        kernel, rest = split_first_kernel(params)
        flat = preprocess_flat(model, inputs)
        z_nob = flat @ kernel.astype(model.compute_dtype)   # (B, N)

        def loss_rest(rest_p, z_):
            b1 = rest_p["params"]["encoder"]["Dense_0"]["bias"]
            out = tail_apply(model, rest_p,
                             z_ + b1.astype(z_.dtype))
            return criterion(out, ap, n_valid)

        loss, (g_rest, dz) = jax.value_and_grad(
            loss_rest, argnums=(0, 1))(rest, z_nob)
        upd_rest, rest_state = tx_rest.update(g_rest, rest_state, rest)
        rest = apply_updates_rest(rest, upd_rest, seed)
        kernel, fstate = fused_readout_update(
            kernel, flat, dz, fstate, schedule, seed=seed,
            use_pallas=use_pallas, interpret=interpret)
        return merge_first_kernel(rest, kernel), (fstate, rest_state), loss

    return step


def init_fused_opt_state(params, tx_rest, split=split_first_kernel):
    kernel, rest = split(params)
    return init_fused_state(kernel), tx_rest.init(rest)


# ---------------------------------------------------------------------------
# VideoMAEProbe head integration: the frozen-feature readout
# ---------------------------------------------------------------------------
#
# The probe's trainable readout is Linear(1568*768 -> enc_out) ->
# Linear(-> 100*N) with NO activation between (reference
# /root/reference/src/model/videomae.py:13-14; models/videomae.py head()).
# The first kernel is ~308M params and the production trainer feeds it
# cached frozen features (train/base.py frozen-split path), so the head
# step is exactly the HBM-bound giant-readout shape the fused update was
# built for.


def split_head_kernel(params):
    """(encoder_head kernel, params-without-it) for VideoMAEProbe."""
    kernel = params["params"]["encoder_head"]["kernel"]
    rest = {**params,
            "params": {**params["params"],
                       "encoder_head": {
                "bias": params["params"]["encoder_head"]["bias"]}}}
    return kernel, rest


def merge_head_kernel(rest, kernel):
    return {**rest,
            "params": {**rest["params"],
                       "encoder_head": {
                "bias": rest["params"]["encoder_head"]["bias"],
                "kernel": kernel}}}


def make_fused_probe_head_step(model, tx_rest, schedule, criterion,
                               apply_updates_rest, *, use_pallas=None,
                               interpret=False):
    """Fused head-only train step over cached frozen features.

    ``step(params, opt_state, hidden, ap, n_valid, seed)`` where ``hidden``
    is the staged (B, L, D) backbone output. Mirrors
    ``VideoMAEProbe.head`` (f32 promotion: flax Dense with dtype=None casts
    the bf16 kernel up), with the encoder_head kernel updated from its
    rank-B factors. ``opt_state = (FusedReadoutState, tx_rest state)``.
    """
    out_dim = model.config["decoder"]["output_dim"]

    def step(params, opt_state, hidden, ap, n_valid, seed):
        fstate, rest_state = opt_state
        kernel, rest = split_head_kernel(params)
        b = hidden.shape[0]
        flat = hidden.reshape(b, -1).astype(jnp.float32)
        z_nob = flat @ kernel.astype(jnp.float32)

        def loss_rest(rest_p, z_):
            b1 = rest_p["params"]["encoder_head"]["bias"]
            z1 = z_ + b1.astype(jnp.float32)
            dec = rest_p["params"]["decoder_head"]
            out = (z1 @ dec["kernel"].astype(jnp.float32)
                   + dec["bias"].astype(jnp.float32))
            out = out.reshape(b, 100, out_dim // 100)
            return criterion(out, ap, n_valid)

        loss, (g_rest, dz) = jax.value_and_grad(
            loss_rest, argnums=(0, 1))(rest, z_nob)
        upd_rest, rest_state = tx_rest.update(g_rest, rest_state, rest)
        rest = apply_updates_rest(rest, upd_rest, seed)
        kernel, fstate = fused_readout_update(
            kernel, flat, dz, fstate, schedule, seed=seed,
            use_pallas=use_pallas, interpret=interpret)
        return merge_head_kernel(rest, kernel), (fstate, rest_state), loss

    return step

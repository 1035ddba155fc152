"""adamw_lowmem: converges like optax.adamw; bf16 state dtype verified.
adamw_sr_bf16 + apply_updates_sr: stochastic rounding is unbiased,
accumulates sub-ulp updates that nearest rounding discards, and converges
like the f32 optimizer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video_spike_tpu.ops.optim import (adamw_lowmem, adamw_sr_bf16,
                                       apply_updates_sr, _hash_bits,
                                       _sr_to_bf16)


def _quadratic_losses(tx, steps=200, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(20, 10)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(20,)).astype(np.float32))
    params = {"w": jnp.zeros((10,), jnp.float32)}
    opt = tx.init(params)

    def loss_fn(p):
        return jnp.mean((A @ p["w"] - b) ** 2)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(steps):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    return losses


def test_lowmem_matches_adamw_convergence():
    ref = _quadratic_losses(optax.adamw(5e-2, weight_decay=0.0))
    low = _quadratic_losses(adamw_lowmem(5e-2, weight_decay=0.0))
    # same trajectory within bf16 state noise
    assert abs(low[-1] - ref[-1]) < 1e-3, (low[-1], ref[-1])
    np.testing.assert_allclose(low[:20], ref[:20], rtol=0.05, atol=1e-3)


def test_lowmem_state_is_bf16():
    tx = adamw_lowmem(1e-3)
    params = {"w": jnp.zeros((8,), jnp.float32)}
    state = tx.init(params)
    adam_state = state[0]
    assert adam_state.mu["w"].dtype == jnp.bfloat16
    assert adam_state.nu["w"].dtype == jnp.bfloat16


def test_lowmem_weight_decay_applies():
    tx = adamw_lowmem(1e-1, weight_decay=0.5)
    params = {"w": jnp.ones((4,), jnp.float32)}
    state = tx.init(params)
    grads = {"w": jnp.zeros((4,), jnp.float32)}
    updates, _ = tx.update(grads, state, params)
    # zero grads: update is pure decay = -lr * wd * w
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.05, rtol=1e-5)


# ---------------- stochastic-rounding bf16 parameter store ----------------


def test_hash_bits_uniform_low16():
    bits = np.asarray(_hash_bits(jnp.uint32(3), 1, 1 << 16)) & 0xFFFF
    # mean of U[0, 65535] is 32767.5; std of the mean over 65536 draws ~74
    assert abs(bits.mean() - 32767.5) < 300
    # all 16 low bits actually toggle
    assert (np.bitwise_or.reduce(bits) == 0xFFFF
            and np.bitwise_and.reduce(bits) == 0)
    # different steps give different streams
    other = np.asarray(_hash_bits(jnp.uint32(4), 1, 1 << 16)) & 0xFFFF
    assert (bits != other).mean() > 0.9


def test_sr_is_unbiased():
    # a value 1/4 of the way between two bf16 neighbors must round up
    # ~25% of the time; nearest rounding would give 0% (pure bias)
    lo = np.float32(np.float32(1.0))          # bf16-exact
    ulp = np.float32(2.0 ** -7)               # bf16 ulp at 1.0 (7 mantissa bits)
    v = jnp.full((20000,), lo + 0.25 * ulp, jnp.float32)
    bits = _hash_bits(jnp.uint32(0), 7, v.size)
    r = np.asarray(_sr_to_bf16(v, bits), np.float32)
    up_frac = (r > lo).mean()
    assert 0.22 < up_frac < 0.28, up_frac
    # unbiased in expectation
    assert abs(r.mean() - (lo + 0.25 * ulp)) < 0.02 * ulp


def test_sr_accumulates_subulp_updates():
    # +1e-4 is ~1/39 of the bf16 ulp at 1.0: nearest rounding discards it
    # every step (stays exactly 1.0 forever); SR accumulates it in
    # expectation.
    p_sr = {"w": jnp.ones((256,), jnp.bfloat16)}
    p_nr = {"w": jnp.ones((256,), jnp.bfloat16)}
    u = {"w": jnp.full((256,), 1e-4, jnp.bfloat16)}
    step_sr = jax.jit(apply_updates_sr)
    step_nr = jax.jit(optax.apply_updates)
    for i in range(1000):
        p_sr = step_sr(p_sr, u, jnp.uint32(i))
        p_nr = step_nr(p_nr, u)
    drift = float(jnp.mean(p_sr["w"].astype(jnp.float32))) - 1.0
    assert 0.08 < drift < 0.12, drift          # E[drift] = 0.1
    assert float(jnp.mean(p_nr["w"].astype(jnp.float32))) == 1.0


def test_sr_exact_add_on_f32_leaves():
    p = {"big": jnp.ones((8,), jnp.bfloat16), "small": jnp.ones((3,))}
    u = {"big": jnp.zeros((8,), jnp.bfloat16),
         "small": jnp.full((3,), 1e-4, jnp.float32)}
    out = apply_updates_sr(p, u, jnp.uint32(0))
    assert out["small"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out["small"]), 1.0001, rtol=1e-6)
    assert out["big"].dtype == jnp.bfloat16


def _quadratic_losses_sr(lr, steps=200, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(20, 10)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(20,)).astype(np.float32))
    params = {"w": jnp.zeros((10,), jnp.bfloat16)}
    tx = adamw_sr_bf16(lr, weight_decay=0.0)
    opt = tx.init(params)

    def loss_fn(p):
        return jnp.mean((A @ p["w"].astype(jnp.float32) - b) ** 2)

    @jax.jit
    def step(params, opt_state, i):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return apply_updates_sr(params, updates, i), opt_state, loss

    losses = []
    for i in range(steps):
        params, opt, loss = step(params, opt, jnp.uint32(i))
        losses.append(float(loss))
    return losses


def test_sr_convergence_matches_f32():
    ref = _quadratic_losses(optax.adamw(5e-2, weight_decay=0.0))
    sr = _quadratic_losses_sr(5e-2)
    # early trajectory matches; the floor is within bf16-parameter noise
    np.testing.assert_allclose(sr[:20], ref[:20], rtol=0.05, atol=2e-3)
    assert sr[-1] < ref[-1] + 0.05, (sr[-1], ref[-1])


def test_sr_rounds_to_adjacent_bf16_values():
    """Property: SR output is always one of the two bf16 values bracketing
    the input (never skips levels, never moves against the remainder)."""
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(4096,)) * np.exp(
        rng.uniform(-20, 10, size=(4096,)))).astype(np.float32)
    bits = _hash_bits(jnp.uint32(9), 3, x.size)
    r = np.asarray(_sr_to_bf16(jnp.asarray(x), bits), np.float32)
    # compute true floor/ceil in bf16 space via the bit pattern
    u = x.view(np.uint32)
    floor = (u & 0xFFFF0000).view(np.float32)
    has_frac = (u & 0xFFFF) != 0
    ceil_bits = ((u & 0xFFFF0000) + np.where(has_frac, 0x10000, 0)
                 ).astype(np.uint32)
    ceil = ceil_bits.view(np.float32)
    # SR result equals floor or ceil of the magnitude, elementwise
    ok = (r == floor) | (r == ceil)
    assert ok.all(), (x[~ok][:5], r[~ok][:5])


def test_sr_optimizer_composes_with_frozen_mask():
    """param_dtype=bfloat16_sr + make_optimizer(frozen_paths=...): the
    multi_transform's MaskedNode placeholders must pass through the lowmem
    Adam transform (a bare isinstance-tuple is_leaf used to IndexError on
    them), frozen bf16 leaves must stay bit-stable under stochastic
    rounding (zero update on an exactly-representable value cannot carry),
    and trainable leaves must move."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from video_spike_tpu.core.config import DictConfig
    from video_spike_tpu.ops.optim import apply_updates_sr
    from video_spike_tpu.train.base import make_optimizer

    tx, _ = make_optimizer(
        DictConfig({"optimizer": {"lr": 1e-2,
                                  "param_dtype": "bfloat16_sr"}}),
        100, frozen_paths=("frozen",))
    rng = np.random.default_rng(0)
    params = {"params": {
        "frozen": {"kernel": jnp.asarray(
            rng.normal(size=(64, 64)), jnp.bfloat16)},
        "train": {"kernel": jnp.asarray(
            rng.normal(size=(64, 64)), jnp.bfloat16)}}}
    opt_state = tx.init(params)
    before = jax.tree.map(np.asarray, params)
    for i in range(3):
        grads = jax.tree.map(jnp.ones_like, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = apply_updates_sr(params, updates, jnp.uint32(i))
    np.testing.assert_array_equal(
        before["params"]["frozen"]["kernel"],
        np.asarray(params["params"]["frozen"]["kernel"]))
    assert float(np.abs(
        before["params"]["train"]["kernel"]
        - np.asarray(params["params"]["train"]["kernel"])).max()) > 0


def test_adafactor_optimizer_option():
    """optimizer.name: adafactor (opt-in; AdamW stays the parity default):
    converges on a least-squares probe under the bf16+SR store and keeps
    only factored second-moment stats (state is O(n+m), not O(n*m))."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from video_spike_tpu.core.config import DictConfig
    from video_spike_tpu.ops.optim import apply_updates_sr
    from video_spike_tpu.train.base import make_optimizer

    rng = np.random.default_rng(0)
    W_true = rng.normal(size=(256, 256)).astype(np.float32)
    X = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32))
    Y = X @ jnp.asarray(W_true)
    tx, _ = make_optimizer(DictConfig({"optimizer": {
        "lr": 1e-1, "name": "adafactor",
        "param_dtype": "bfloat16_sr", "warmup_pct": 0.1}}), 600)
    params = {"w": jnp.zeros((256, 256), jnp.bfloat16)}
    opt_state = tx.init(params)
    # factored stats: total optimizer state is far below the 2*n*m full
    # Adam moments (256*256 params -> full moments would be 131072)
    n_state = sum(x.size for x in jax.tree.leaves(opt_state)
                  if hasattr(x, "size"))
    assert n_state < 4096

    def loss_fn(p):
        return jnp.mean((X @ p["w"].astype(jnp.float32) - Y) ** 2)

    @jax.jit
    def step(params, opt_state, i):
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = tx.update(g, opt_state, params)
        return apply_updates_sr(params, u, i), opt_state, loss

    loss0 = float(loss_fn(params))
    for i in range(600):
        params, opt_state, loss = step(params, opt_state, jnp.uint32(i))
    assert float(loss) < loss0 * 1e-2, (loss0, float(loss))


def test_adafactor_lean_convergence_matches_optax():
    """ops/optim.adafactor_lean (factored RMS, no side passes, grad-dtype
    updates) converges like optax.adafactor on a least-squares probe and
    keeps O(n+m) state for factored leaves."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from video_spike_tpu.ops.optim import adafactor_lean, apply_updates_sr

    rng = np.random.default_rng(1)
    W_true = rng.normal(size=(256, 256)).astype(np.float32)
    X = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32))
    Y = X @ jnp.asarray(W_true)

    def run(tx):
        params = {"w": jnp.zeros((256, 256), jnp.bfloat16)}
        opt_state = tx.init(params)

        def loss_fn(p):
            return jnp.mean((X @ p["w"].astype(jnp.float32) - Y) ** 2)

        @jax.jit
        def step(params, opt_state, i):
            loss, g = jax.value_and_grad(loss_fn)(params)
            g = jax.tree.map(lambda a: a.astype(jnp.bfloat16), g)
            u, opt_state = tx.update(g, opt_state, params)
            return apply_updates_sr(params, u, i), opt_state, loss

        for i in range(600):
            params, opt_state, loss = step(params, opt_state, jnp.uint32(i))
        return float(loss)

    lean = adafactor_lean(1e-1)
    n_state = sum(x.size for x in jax.tree.leaves(lean.init(
        {"w": jnp.zeros((256, 256), jnp.bfloat16)}))
        if hasattr(x, "size"))
    assert n_state < 4096   # factored: 512 + count, not 65536

    loss_lean = run(lean)
    loss_optax = run(optax.adafactor(
        1e-1, multiply_by_parameter_scale=False, clipping_threshold=None))
    # both plateau at the SR-store noise floor (~lr-proportional); the
    # lean transform must land in the same class as optax's
    assert loss_lean < 257.0 * 0.02, loss_lean   # init mse is ~257
    assert loss_lean < loss_optax * 2 + 1e-3, (loss_lean, loss_optax)

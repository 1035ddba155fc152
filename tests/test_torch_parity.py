"""End-to-end quality parity vs a faithful torch implementation of the
reference recipe.

BASELINE.json's quality target is "bits-per-spike parity on held-out IBL
sessions". The reference's loader/trainer layers cannot run here (webdataset
and torchvision are not installed) — its dependency-clean modules CAN, and
``tests/test_reference_golden.py`` imports those directly for RRR/InfoNCE
goldens — so this test re-states the full training recipe
in ~40 lines of torch written from scratch — the same architecture
(encoder MLP -> decoder MLP, ``/root/reference/src/model/linear.py:3-56``),
loss (PoissonNLL(log_input=True), ``/root/reference/src/train.py:59``), and
optimizer (AdamW + OneCycleLR, ``:44-57``) — trains it and the framework's
``LinearModel`` on an identical planted-linear synthetic session, and
requires the JAX trainer's held-out bits/spike to match or beat torch's.

Run on CPU (conftest pins the backend); torch is the CPU build.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from video_spike_tpu.ops.metrics import bits_per_spike

N_TRAIN, N_TEST, N_FEAT, T_BINS, N_NEURONS = 512, 64, 40, 10, 12
EPOCHS, BATCH, LR, WD = 25, 16, 1e-2, 0.01
HIDDEN = 32


@pytest.fixture(scope="module")
def planted_session():
    """X ~ N(0,1); spikes ~ Poisson(exp(W0 @ x + b0)), so a linear readout
    is the right model class and both learners can reach the same floor
    (oracle log-rates score ~0.48 bps on this draw; 512 train trials keep
    the overfit gap small — at 128 trials both stacks memorize Poisson
    noise and held-out bps goes negative)."""
    rng = np.random.default_rng(7)
    n = N_TRAIN + N_TEST
    X = rng.normal(size=(n, N_FEAT)).astype(np.float32)
    W0 = (rng.normal(size=(N_FEAT, T_BINS * N_NEURONS)) / np.sqrt(N_FEAT)
          ).astype(np.float32) * 0.8
    b0 = rng.normal(size=(T_BINS * N_NEURONS,)).astype(np.float32) * 0.2 + 0.5
    rates = np.exp(np.clip(X @ W0 + b0, -6, 3))
    y = rng.poisson(rates).astype(np.float32).reshape(n, T_BINS, N_NEURONS)
    return (X[:N_TRAIN], y[:N_TRAIN]), (X[N_TRAIN:], y[N_TRAIN:])


def _heldout_bps(y_true, log_rates):
    preds = np.exp(np.asarray(log_rates, np.float64))
    return float(bits_per_spike(
        np.swapaxes(preds, 0, -1), np.swapaxes(y_true, 0, -1)))


def _train_torch(train, test):
    (Xtr, ytr), (Xte, yte) = train, test
    torch.manual_seed(0)
    model = torch.nn.Sequential(
        torch.nn.Linear(N_FEAT, HIDDEN), torch.nn.ReLU(),
        torch.nn.Linear(HIDDEN, T_BINS * N_NEURONS))
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD,
                            eps=1e-8)
    steps = (len(Xtr) // BATCH) * EPOCHS
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=LR, total_steps=steps, pct_start=0.15, div_factor=10,
        final_div_factor=1e4)
    crit = torch.nn.PoissonNLLLoss(log_input=True, reduction="mean")
    Xt, yt = torch.from_numpy(Xtr), torch.from_numpy(
        ytr.reshape(len(ytr), -1))
    g = torch.Generator().manual_seed(1)
    for _ in range(EPOCHS):
        perm = torch.randperm(len(Xt), generator=g)
        for s in range(0, len(Xt) - BATCH + 1, BATCH):
            idx = perm[s:s + BATCH]
            opt.zero_grad()
            loss = crit(model(Xt[idx]), yt[idx])
            loss.backward()
            opt.step()
            sched.step()
    with torch.no_grad():
        out = model(torch.from_numpy(Xte)).numpy()
    return _heldout_bps(yte, out.reshape(len(Xte), T_BINS, N_NEURONS))


def _train_jax(train, test):
    from video_spike_tpu.models.linear import LinearModel
    from video_spike_tpu.ops.poisson import poisson_nll_mean
    from video_spike_tpu.train.base import make_optimizer

    (Xtr, ytr), (Xte, yte) = train, test
    model = LinearModel(encoder_hidden=(HIDDEN,), encoder_out=HIDDEN,
                        decoder_hidden=(), output_dim=T_BINS * N_NEURONS,
                        t_bins=T_BINS, compute_dtype=jnp.float32)

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

        def get(self, k, d=None):
            return super().get(k, d)

    steps = (len(Xtr) // BATCH) * EPOCHS
    config = _Cfg(optimizer=_Cfg(lr=LR, wd=WD, eps=1e-8, warmup_pct=0.15,
                                 div_factor=10))
    tx, _ = make_optimizer(config, steps)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(Xtr[:1]))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda p: poisson_nll_mean(model.apply(p, x), y))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(1)
    Xd, yd = jnp.asarray(Xtr), jnp.asarray(ytr)
    for _ in range(EPOCHS):
        perm = rng.permutation(len(Xtr))
        for s in range(0, len(Xtr) - BATCH + 1, BATCH):
            idx = jnp.asarray(perm[s:s + BATCH])
            params, opt_state, _ = step(params, opt_state, Xd[idx], yd[idx])
    out = model.apply(params, jnp.asarray(Xte))
    return _heldout_bps(yte, out)


def test_jax_matches_torch_reference_recipe_bps(planted_session):
    train, test = planted_session
    bps_torch = _train_torch(train, test)
    bps_jax = _train_jax(train, test)
    # both must actually learn (well above the mean-rate null at 0)
    assert bps_torch > 0.1, bps_torch
    assert bps_jax > 0.1, bps_jax
    # parity: within noise of the torch recipe, never materially below
    assert bps_jax > bps_torch - 0.05, (bps_jax, bps_torch)

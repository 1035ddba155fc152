"""RRR model: fit quality, shared-V multi-session, pipeline co-bps."""

import numpy as np
import pytest

from video_spike_tpu.models.rrr import RRRGD, compute_beta, predict, train_model_main
from video_spike_tpu.train.rrr_pipeline import train_rrr


def _make_lowrank_session(rng, K=40, T=20, C=4, N=10, ncomp=2, noise=0.05):
    """y = X @ beta with beta exactly rank-`ncomp` over (C, T)."""
    X = rng.normal(size=(K, T, C)).astype(np.float64)
    U = rng.normal(size=(N, C - 1, ncomp)) / np.sqrt(T * ncomp)
    V = rng.normal(size=(ncomp, T))
    b = rng.normal(size=(N, 1, T)) * 0.1
    beta = np.concatenate([np.einsum("ncr,rt->nct", U, V), b], axis=1)
    y = np.einsum("ktc,nct->ktn", X, beta)
    y = y + noise * rng.normal(size=y.shape)
    return X, y


def test_rrr_fit_recovers_lowrank(rng):
    X, y = _make_lowrank_session(rng)
    Ktr = 30
    data = {"sess0": {"X": [X[:Ktr], X[Ktr:]], "y": [y[:Ktr], y[Ktr:]],
                      "setup": {}}}
    model, mse_val = train_model_main(data, l2=0.0, n_comp=2,
                                      save=False, max_iter=150)
    # validation MSE per timepoint-element should approach the noise floor
    val_elems = np.prod(y[Ktr:].shape)
    mse = mse_val["mse_val_mean"] / val_elems
    assert mse < 0.01, f"val mse {mse}"


def test_rrr_beta_shapes_and_predict(rng):
    X, y = _make_lowrank_session(rng, K=8, T=6, C=3, N=5)
    data = {"e": {"X": [X, X], "y": [y, y], "setup": {}}}
    model = RRRGD(data, ncomp=2, l2=1.0)
    beta = compute_beta(model.params, "e")
    assert beta.shape == (5, 3, 6)
    pred = predict(beta, np.asarray(X, dtype=np.float32))
    assert pred.shape == (8, 6, 5)
    # bias-only prediction at init: beta[:, :-1] is random/small; b is PSTH
    np.testing.assert_allclose(np.asarray(model.params["e_b"])[:, 0, :],
                               y.mean(0).T, rtol=1e-5)


def test_rrr_shared_v_multisession(rng):
    X1, y1 = _make_lowrank_session(rng, N=6)
    X2, y2 = _make_lowrank_session(rng, N=9)
    data = {
        "s1": {"X": [X1[:30], X1[30:]], "y": [y1[:30], y1[30:]], "setup": {}},
        "s2": {"X": [X2[:30], X2[30:]], "y": [y2[:30], y2[30:]], "setup": {}},
    }
    model = RRRGD(data, ncomp=2, l2=0.0)
    assert "V" in model.params and "s1_U" in model.params
    assert model.params["s1_U"].shape[0] == 6
    assert model.params["s2_U"].shape[0] == 9
    model.fit(data, max_iter=60)
    mses = model.compute_MSE(data, 1)
    assert set(mses) == {"s1", "s2"}


def test_rrr_als_matches_lbfgs(rng):
    """The closed-form ALS solver reaches at-least-LBFGS loss on the same
    objective, and its validation MSE is within noise of the LBFGS fit."""
    X, y = _make_lowrank_session(rng, K=50, T=16, C=5, N=12, ncomp=2)
    data = {"e": {"X": [X[:40], X[40:]], "y": [y[:40], y[40:]], "setup": {}}}

    m_als = RRRGD(data, ncomp=2, l2=5.0)
    loss_als = m_als.fit(data, solver="als", max_iter=30)
    m_lb = RRRGD(data, ncomp=2, l2=5.0)
    loss_lb = m_lb.fit(data, solver="lbfgs", max_iter=150)

    assert np.isfinite(loss_als)
    assert loss_als <= loss_lb * 1.02, (loss_als, loss_lb)
    mse_als = np.sum(np.concatenate(list(m_als.compute_MSE(data, 1).values())))
    mse_lb = np.sum(np.concatenate(list(m_lb.compute_MSE(data, 1).values())))
    assert mse_als <= mse_lb * 1.05, (mse_als, mse_lb)


def test_rrr_als_monotone_and_multisession(rng):
    """ALS loss decreases with more iterations; shared-V multi-session."""
    X1, y1 = _make_lowrank_session(rng, N=6)
    X2, y2 = _make_lowrank_session(rng, N=9)
    data = {
        "s1": {"X": [X1[:30], X1[30:]], "y": [y1[:30], y1[30:]], "setup": {}},
        "s2": {"X": [X2[:30], X2[30:]], "y": [y2[:30], y2[30:]], "setup": {}},
    }
    losses = []
    for n_iter in (1, 4, 16):
        m = RRRGD(data, ncomp=2, l2=1.0)
        losses.append(m.fit_als(data, n_iter=n_iter))
    assert losses[2] <= losses[1] <= losses[0] * (1 + 1e-5), losses
    assert m.params["s1_U"].shape[0] == 6
    assert m.params["s2_U"].shape[0] == 9


def test_rrr_state_roundtrip(tmp_path, rng):
    X, y = _make_lowrank_session(rng, K=8, T=6, C=3, N=5)
    data = {"e": {"X": [X, X], "y": [y, y], "setup": {}}}
    model = RRRGD(data, ncomp=2, l2=1.0)
    model.fit(data, max_iter=10)
    path = tmp_path / "rrr.pkl"
    model.save(path)
    model2 = RRRGD.load(path, data)
    np.testing.assert_allclose(np.asarray(model2.params["V"]),
                               np.asarray(model.params["V"]))


def test_train_rrr_pipeline_positive_bps(rng):
    """Poisson spikes driven by a low-rank function of X -> co-bps > 0."""
    K, T, C, N = 60, 20, 3, 8
    X = rng.normal(size=(K, T, C))
    w = rng.normal(size=(C, N)) * 0.5
    lograte = X @ w - 0.3
    spikes = rng.poisson(np.exp(lograte)).astype(np.float64)
    Ktr = 45
    data = {"e1": {
        "X": [X[:Ktr], X[Ktr:]],
        "y": [spikes[:Ktr], spikes[Ktr:]],
        "setup": {},
    }}
    result = train_rrr(data, l2=10.0, n_comp=3, max_iter=100)
    bps = np.nanmean(result["e1"]["bps"])
    r2 = np.nanmean(result["e1"]["r2"])
    assert bps > 0.05, f"co-bps {bps}"
    assert result["e1"]["pred"].min() >= 1e-3  # clipped
    assert np.isfinite(r2)

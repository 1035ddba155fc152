"""Reduced-rank regression (RRR) spike predictor.

Capability parity with ``/root/reference/src/model/rrr.py:29-202``:

- per-session factors ``U: (N, ncoef-1, ncomp)`` and bias ``b: (N, 1, T)``
  (initialized to the train-mean PSTH), with ``V: (ncomp, T)`` shared across
  sessions; ``beta = concat(U @ V, b)`` -> (N, ncoef, T);
- prediction ``einsum("ktc,nct->ktn", X, beta)``;
- objective: summed squared error on the train split plus ``l2 * sum(beta²)``;
- fit by LBFGS (torch ``optim.LBFGS(...).step(closure)`` becomes an
  `optax.lbfgs` loop with zoom linesearch, jitted end-to-end on device);
- ``predict_y_fr`` un-standardizes with stored per-session mean/std.

Initialization uses ``np.random.seed(0)`` streams exactly like the reference
so factor scales match.

Intentional deviation (PARITY.md): the production solver is ``solver="als"``
— a closed-form two-block alternating least squares. The objective is exactly
block-solvable: with V's rows orthonormalized (QR), the joint (U, b) problem
is one ridge solve shared across neurons; with (U, b) fixed, each time slice
of V is a tiny generalized-ridge solve with penalty matrix UᵀU. Both blocks
are exact minimizers, so the loss decreases monotonically and converges in
~20 iterations of cheap einsums — replacing the reference's 120-iteration
LBFGS (whose unrolled zoom linesearch costs ~100 s of TPU compile at the
recipe shape). LBFGS is kept for parity tests.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


def _init_params(train_data: Dict, ncomp: int) -> Dict[str, np.ndarray]:
    np.random.seed(0)
    params: Dict[str, np.ndarray] = {}
    V = None
    for eid in train_data:
        X = train_data[eid]["X"][0]
        y = train_data[eid]["y"][0]
        K, T, ncoef = X.shape
        N = y.shape[2]
        U = np.random.normal(size=(N, ncoef - 1, ncomp)) / np.sqrt(T * ncomp)
        V = np.random.normal(size=(ncomp, T)) / np.sqrt(T * ncomp)
        b = np.ascontiguousarray(np.expand_dims(y.mean(0).T, 1))
        params[f"{eid}_U"] = U.astype(np.float32)
        params[f"{eid}_b"] = b.astype(np.float32)
    params["V"] = V.astype(np.float32)  # shared; last session's draw (parity)
    return params


def compute_beta(params: Dict, eid: str, withbias: bool = True) -> jnp.ndarray:
    """(N, ncoef, T) coefficient tensor for one session."""
    U = params[f"{eid}_U"]
    V = params["V"]
    beta = jnp.einsum("ncr,rt->nct", U, V, preferred_element_type=jnp.float32)
    b = params[f"{eid}_b"] if withbias else jnp.zeros_like(params[f"{eid}_b"])
    return jnp.concatenate([beta, b], axis=1)


def predict(beta: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """X: (K, T, ncoef), beta: (N, ncoef, T) -> (K, T, N)."""
    return jnp.einsum("ktc,nct->ktn", X, beta,
                      preferred_element_type=jnp.float32)


def _als_precompute(X: jnp.ndarray, y: jnp.ndarray):
    """Session sufficient statistics — everything the ALS blocks need.

    X: (K, T, ncoef) whose trailing column multiplies the per-(neuron, time)
    coefficient b (an all-ones column in the production pipeline, but the
    objective is defined for any column — see ``predict``), y: (K, T, N).
    """
    Xm, xb = X[:, :, :-1], X[:, :, -1]
    S = jnp.einsum("kta,ktb->tab", Xm, Xm)    # (T, C, C)
    sxb = jnp.einsum("ktc,kt->tc", Xm, xb)    # (T, C)
    s2 = jnp.sum(xb * xb, axis=0)             # (T,)
    P = jnp.einsum("ktc,ktn->tcn", Xm, y)     # (T, C, N)
    syb = jnp.einsum("kt,ktn->tn", xb, y)     # (T, N)
    return S, sxb, s2, P, syb


def _als_fit(pre, Us, V, bs, l2: float, n_iter: int):
    """Two-block exact ALS on the RRR objective (see module docstring).

    pre: list of per-session stats from :func:`_als_precompute`;
    Us: list of (N, C, R); V: (R, T); bs: list of (N, T). Returns the
    minimizing (Us, V, bs).
    """
    T = V.shape[1]
    eps = 1e-6  # numerical jitter for the l2=0 case; data is standardized

    def iteration(carry, _):
        Us, V, bs = carry
        # ---- joint (U, b) ridge per session, V rows orthonormalized so the
        # l2 penalty on beta = U_flat V becomes plain l2||U_flat||²
        Q, _ = jnp.linalg.qr(V.T)            # (T, R), orthonormal columns
        Vt = Q.T                              # spans the same rows as V
        new_Us, new_bs = [], []
        for (S, sxb, s2, P, syb), U in zip(pre, Us):
            N, C, R = U.shape
            d = C * R
            FtF = jnp.einsum("tab,rt,st->arbs", S, Vt, Vt).reshape(d, d)
            FtE = jnp.einsum("tc,rt->crt", sxb, Vt).reshape(d, T)
            FtY = jnp.einsum("tcn,rt->crn", P, Vt).reshape(d, N)
            A = jnp.concatenate([
                jnp.concatenate([FtF, FtE], axis=1),
                jnp.concatenate([FtE.T, jnp.diag(s2)], axis=1),
            ], axis=0) + (l2 + eps) * jnp.eye(d + T)
            W = jnp.linalg.solve(A, jnp.concatenate([FtY, syb], axis=0))
            new_Us.append(W[:d].T.reshape(N, C, R))
            new_bs.append(W[d:].T)            # (N, T)
        # ---- shared-V generalized ridge, one tiny solve per time slice,
        # sufficient statistics summed across sessions
        GtG = jnp.zeros((T, V.shape[0], V.shape[0]))
        rhs = jnp.zeros((T, V.shape[0]))
        M = jnp.zeros((V.shape[0], V.shape[0]))
        for (S, sxb, s2, P, syb), U, b in zip(pre, new_Us, new_bs):
            Q4 = jnp.einsum("ncr,nds->cdrs", U, U)
            GtG = GtG + jnp.einsum("tcd,cdrs->trs", S, Q4)
            M = M + jnp.einsum("ncr,ncs->rs", U, U)
            rhs = rhs + (jnp.einsum("ncr,tcn->tr", U, P)
                         - jnp.einsum("ncr,tc,nt->tr", U, sxb, b))
        A = GtG + l2 * M[None] + eps * jnp.eye(V.shape[0])[None]
        V_new = jnp.linalg.solve(A, rhs[..., None])[..., 0].T  # (R, T)
        return (tuple(new_Us), V_new, tuple(new_bs)), None

    (Us, V, bs), _ = jax.lax.scan(iteration, (tuple(Us), V, tuple(bs)),
                                  None, length=n_iter)
    return Us, V, bs


class RRRGD:
    """Multi-session reduced-rank regressor with shared temporal basis V."""

    def __init__(self, train_data: Dict, ncomp: int, l2: float = 0.0):
        self.l2 = float(l2)
        self.eids = list(train_data.keys())
        self.withbias = True
        self.n_comp = ncomp
        self.params = {k: jnp.asarray(v)
                       for k, v in _init_params(train_data, ncomp).items()}
        self.T = self.params["V"].shape[1]
        self.N = sum(train_data[e]["y"][0].shape[2] for e in self.eids)

    # ------------------------------------------------------------------
    def loss_fn(self, params: Dict, data: Dict) -> jnp.ndarray:
        """Total train MSE + l2 regularization over all sessions."""
        total = 0.0
        for eid in self.eids:
            beta = compute_beta(params, eid, self.withbias)
            ypred = predict(beta, data[eid]["X"])
            total = total + jnp.sum((ypred - data[eid]["y"]) ** 2)
            total = total + self.l2 * jnp.sum(beta ** 2)
        return total

    def fit(self, train_data: Dict, max_iter: int = 120,
            tol: float = 1e-7, solver: str = "lbfgs") -> float:
        """Fit on the train split (k=0 arrays). Returns final loss.

        solver="als" dispatches to the closed-form block solver
        (:meth:`fit_als`); "lbfgs" keeps the reference-parity optimizer.
        """
        if solver == "als":
            return self.fit_als(train_data, n_iter=min(max_iter, 30))
        data = {eid: {"X": jnp.asarray(train_data[eid]["X"][0],
                                       dtype=jnp.float32),
                      "y": jnp.asarray(train_data[eid]["y"][0],
                                       dtype=jnp.float32)}
                for eid in self.eids}

        loss = lambda p: self.loss_fn(p, data)
        opt = optax.lbfgs()
        value_and_grad = optax.value_and_grad_from_state(loss)

        def step(carry, _):
            params, state = carry
            value, grad = value_and_grad(params, state=state)
            updates, state = opt.update(grad, state, params, value=value,
                                        grad=grad, value_fn=loss)
            params = optax.apply_updates(params, updates)
            return (params, state), value

        @jax.jit
        def run(params):
            state = opt.init(params)
            (params, _), values = jax.lax.scan(step, (params, state),
                                               None, length=max_iter)
            return params, values

        self.params, values = run(self.params)
        return float(values[-1])

    def fit_als(self, train_data: Dict, n_iter: int = 30) -> float:
        """Closed-form two-block ALS fit (the production solver)."""
        data = {eid: {"X": jnp.asarray(train_data[eid]["X"][0],
                                       dtype=jnp.float32),
                      "y": jnp.asarray(train_data[eid]["y"][0],
                                       dtype=jnp.float32)}
                for eid in self.eids}
        run = jax.jit(
            lambda pre, Us, V, bs: _als_fit(pre, Us, V, bs, self.l2, n_iter))
        pre = [_als_precompute(data[e]["X"], data[e]["y"]) for e in self.eids]
        Us = [self.params[f"{e}_U"] for e in self.eids]
        bs = [self.params[f"{e}_b"][:, 0, :] for e in self.eids]
        Us, V, bs = run(pre, Us, self.params["V"], bs)
        self.params["V"] = V
        for eid, U, b in zip(self.eids, Us, bs):
            self.params[f"{eid}_U"] = U
            self.params[f"{eid}_b"] = b[:, None, :]
        return float(self.loss_fn(self.params, data))

    # ------------------------------------------------------------------
    def predict_y(self, data: Dict, eid: str, k: int):
        beta = compute_beta(self.params, eid, self.withbias)
        X = jnp.asarray(data[eid]["X"][k], dtype=jnp.float32)
        y = jnp.asarray(data[eid]["y"][k], dtype=jnp.float32)
        return X, y, predict(beta, X)

    def predict_y_fr(self, data: Dict, eid: str, k: int):
        """Prediction un-standardized back to firing-rate space."""
        X, y, ypred = self.predict_y(data, eid, k)
        mean_y = jnp.asarray(data[eid]["setup"]["mean_y_TN"])
        std_y = jnp.asarray(data[eid]["setup"]["std_y_TN"])
        return X, y * std_y + mean_y, ypred * std_y + mean_y

    def compute_MSE(self, data: Dict, k: int) -> Dict[str, np.ndarray]:
        """Per-session per-neuron summed squared error on split k."""
        out = {}
        for eid in self.eids:
            _, y, ypred = self.predict_y(data, eid, k)
            out[eid] = np.asarray(jnp.sum((ypred - y) ** 2, axis=(0, 1)))
        return out

    # ------------------------------------------------------------------
    def state_dict(self) -> dict:
        return {
            "model": {k: np.asarray(v) for k, v in self.params.items()},
            "l2": self.l2,
            "eids": self.eids,
            "N": self.N,
            "T": self.T,
            "n_comp": self.n_comp,
        }

    def load_state_dict(self, state: dict) -> None:
        self.params = {k: jnp.asarray(v) for k, v in state["model"].items()}

    def save(self, path: str | Path) -> None:
        with open(path, "wb") as f:
            pickle.dump(self.state_dict(), f)

    @classmethod
    def load(cls, path: str | Path, train_data: Dict) -> "RRRGD":
        with open(path, "rb") as f:
            state = pickle.load(f)
        model = cls(train_data, state["n_comp"], l2=state["l2"])
        model.load_state_dict(state)
        return model


def train_model_main(train_data: Dict, l2: float, n_comp: int,
                     model_fname: str = "tmp", save: bool = True,
                     max_iter: int = 120,
                     solver: str = "als") -> Tuple[RRRGD, dict]:
    """Fit an RRR model; parity with ``/root/reference/src/model/
    rrr.py:192-202`` (fit, validation MSE report, optional save). The
    default solver is the closed-form ALS (same objective, exact block
    minimizers); pass solver="lbfgs" for the reference-parity optimizer."""
    model = RRRGD(train_data, n_comp, l2=l2)
    model.fit(train_data, max_iter=max_iter, solver=solver)
    mses_val = model.compute_MSE(train_data, 1)
    best_loss = float(np.sum(np.concatenate(list(mses_val.values()))))
    if save:
        model.save(model_fname if str(model_fname).endswith(".pkl")
                   else f"{model_fname}.pkl")
    return model, {"mses_val": mses_val, "mse_val_mean": best_loss}

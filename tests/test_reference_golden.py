"""Golden tests against the reference's OWN runnable code.

``/root/reference/src/model/rrr.py`` and ``src/utils/loss_utils.py`` import
only numpy/torch — both installed here — so instead of restating their math
(which can encode the same misreading twice), these tests import the actual
reference modules by file path and assert the rebuild matches their outputs
on shared fixtures:

- InfoNCE (``loss_utils.py:409-431``): values AND autograd gradients, fixed
  and learnable temperature;
- ``loss_fn_`` dispatch (``loss_utils.py:3-21``): every branch;
- RRR (``rrr.py:29-202``): bit-parity of the seeded init, numeric parity of
  beta/predict/un-standardize/MSE on reference-FITTED parameters loaded into
  the rebuild, and fit quality no worse than the reference's LBFGS.

Tolerances: the rebuild computes in float32 (TPU-native), the reference in
torch float64 where numpy seeds its params; comparisons therefore use f32-
scale relative tolerances, not bit equality (except the shared-seed init).

Skipped automatically if torch or the reference checkout is absent.
"""

import importlib.util
import os
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

_REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference checkout not mounted")


def _load_ref(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    with warnings.catch_warnings():
        # the reference's vendored CEBRA criterions use torch.jit.script,
        # deprecated in this torch build — the reference's noise, not ours
        warnings.simplefilter("ignore", DeprecationWarning)
        spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_loss():
    return _load_ref("ref_loss_utils", "utils/loss_utils.py")


@pytest.fixture(scope="module")
def ref_rrr():
    return _load_ref("ref_rrr", "model/rrr.py")


# ---------------------------------------------------------------------------
# InfoNCE / loss_fn_ (loss_utils.py)
# ---------------------------------------------------------------------------

B, D, M = 24, 16, 40


@pytest.fixture(scope="module")
def triplet():
    rng = np.random.default_rng(3)
    ref = rng.normal(size=(B, D)).astype(np.float32)
    pos = rng.normal(size=(B, D)).astype(np.float32)
    neg = rng.normal(size=(M, D)).astype(np.float32)
    # L2-normalize like the models' projected z
    return tuple(x / np.linalg.norm(x, axis=1, keepdims=True)
                 for x in (ref, pos, neg))


@pytest.mark.parametrize("tau", [1.0, 0.37])
def test_info_nce_values_match_reference(ref_loss, triplet, tau):
    from video_spike_tpu.ops.contrastive import info_nce

    r, p, n = triplet
    golden = ref_loss.info_nce(*(torch.from_numpy(x) for x in (r, p, n)),
                               tau=tau)
    ours = info_nce(jnp.asarray(r), jnp.asarray(p), jnp.asarray(n), tau)
    for k in ("loss", "pos_loss", "neg_loss"):
        np.testing.assert_allclose(float(ours[k]), float(golden[k]),
                                   rtol=1e-5, err_msg=k)


def test_info_nce_gradients_match_reference(ref_loss, triplet):
    """Autograd parity, including the detached-max stabilizer and the
    gradient through a LEARNABLE temperature (``loss_utils.py:414-419``:
    c is detached, so no gradient flows through the max)."""
    from video_spike_tpu.ops.contrastive import info_nce

    r, p, n = triplet
    tau0 = 0.5
    tr, tp, tn = (torch.from_numpy(x).requires_grad_(True)
                  for x in (r, p, n))
    ttau = torch.tensor(tau0, requires_grad=True)
    ref_loss.info_nce(tr, tp, tn, tau=ttau)["loss"].backward()

    grads = jax.grad(
        lambda a, b, c, t: info_nce(a, b, c, t)["loss"], argnums=(0, 1, 2, 3)
    )(jnp.asarray(r), jnp.asarray(p), jnp.asarray(n), jnp.float32(tau0))

    for got, want, name in zip(
            grads, (tr.grad, tp.grad, tn.grad, ttau.grad),
            ("ref", "pos", "neg", "tau")):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=2e-4, atol=1e-6, err_msg=name)


def test_loss_fn_dispatch_matches_reference(ref_loss, triplet):
    """Every branch of the output-dict dispatcher (``loss_utils.py:3-21``)."""
    from video_spike_tpu.ops.contrastive import loss_fn_

    r, p, n = triplet
    recon = [0.73, 0.41, 0.55]
    temp = 0.21

    def tdict(z, rc, with_recon, with_temp):
        d = {"z": torch.from_numpy(z)}
        if with_recon:
            d["recon_loss"] = torch.tensor(rc)
        if with_temp:
            d["temp"] = torch.tensor(temp)
        return d

    def jdict(z, rc, with_recon, with_temp):
        d = {"z": jnp.asarray(z)}
        if with_recon:
            d["recon_loss"] = jnp.float32(rc)
        if with_temp:
            d["temp"] = jnp.float32(temp)
        return d

    cases = [
        # (with_recon, with_temp, fix_temp)
        (True, True, True),    # ContrastViTMAE
        (True, True, False),
        (False, True, True),   # ContrastViT
        (False, True, False),
        (True, False, True),   # z + recon_loss, no temp -> mean recon
    ]
    for with_recon, with_temp, fix_temp in cases:
        golden = ref_loss.loss_fn_(
            tdict(r, recon[0], with_recon, with_temp),
            tdict(p, recon[1], with_recon, with_temp),
            tdict(n[:B], recon[2], with_recon, with_temp), fix_temp=fix_temp)
        ours = loss_fn_(
            jdict(r, recon[0], with_recon, with_temp),
            jdict(p, recon[1], with_recon, with_temp),
            jdict(n[:B], recon[2], with_recon, with_temp), fix_temp=fix_temp)
        np.testing.assert_allclose(
            float(ours["loss"]), float(golden["loss"]), rtol=1e-5,
            err_msg=f"recon={with_recon} temp={with_temp} fix={fix_temp}")

    # MAE branch: pos/neg None
    golden = ref_loss.loss_fn_({"recon_loss": torch.tensor(recon[0])},
                               None, None)
    ours = loss_fn_({"recon_loss": jnp.float32(recon[0])}, None, None)
    np.testing.assert_allclose(float(ours["loss"]), float(golden["loss"]),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# RRR (model/rrr.py)
# ---------------------------------------------------------------------------

K, T, NCOEF, NN, NCOMP = 40, 8, 4, 6, 2


@pytest.fixture(scope="module")
def rrr_data():
    """Two sessions of planted low-rank data in the reference's exact
    container format: ``data[eid]['X'][k] (K,T,ncoef)`` with the trailing
    all-ones bias column, ``['y'][k] (K,T,N)`` standardized, and
    ``['setup']`` mean/std for un-standardization (``rrr.py:124-141``)."""
    rng = np.random.default_rng(11)
    data = {}
    for eid in ("sess_a", "sess_b"):
        U0 = rng.normal(size=(NN, NCOEF - 1, NCOMP)) * 0.5
        V0 = rng.normal(size=(NCOMP, T)) * 0.5
        splits = []
        for k in range(2):
            X = rng.normal(size=(K, T, NCOEF)).astype(np.float64)
            X[:, :, -1] = 1.0
            beta = np.einsum("ncr,rt->nct", U0, V0)   # (N, ncoef-1, T)
            y = (np.einsum("ktc,nct->ktn", X[:, :, :-1], beta)
                 + rng.normal(size=(K, T, NN)) * 0.1)
            splits.append((X, y.astype(np.float64)))
        mean_y = splits[0][1].mean(0)           # (T, N)
        std_y = splits[0][1].std(0) + 1e-6
        data[eid] = {
            "X": [s[0] for s in splits],
            "y": [(s[1] - mean_y) / std_y for s in splits],
            "setup": {"mean_y_TN": mean_y, "std_y_TN": std_y},
        }
    return data


def test_rrr_init_matches_reference_seed_streams(ref_rrr, rrr_data):
    """Both inits consume np.random.seed(0) identically (``rrr.py:34-51``),
    so U/V/b agree to f32 casting exactly."""
    from video_spike_tpu.models.rrr import RRRGD

    golden = ref_rrr.RRRGD(rrr_data, NCOMP, l2=0.0)
    ours = RRRGD(rrr_data, NCOMP, l2=0.0)
    for key, val in golden.model.state_dict().items():
        np.testing.assert_array_equal(
            np.asarray(ours.params[key]),
            val.numpy().astype(np.float32), err_msg=key)


@pytest.fixture(scope="module")
def fitted_ref(ref_rrr, rrr_data):
    """Reference model fitted by its own torch-LBFGS ``train_model_main``."""
    torch.manual_seed(0)
    model, mse_val = ref_rrr.train_model_main(
        rrr_data, l2=0.5, n_comp=NCOMP, model_fname="unused", save=False)
    return model, mse_val


def test_rrr_predict_path_matches_reference_on_fitted_params(
        ref_rrr, rrr_data, fitted_ref):
    """Load the reference's FITTED params into the rebuild and require the
    whole predict path — compute_beta, einsum predict, un-standardize,
    per-neuron MSE — to reproduce the reference's numbers
    (``rrr.py:79-155``). This decouples numeric parity from optimizer
    trajectories."""
    from video_spike_tpu.models.rrr import RRRGD

    golden, _ = fitted_ref
    ours = RRRGD(rrr_data, NCOMP, l2=0.5)
    ours.load_state_dict({"model": {
        k: v.numpy() for k, v in golden.model.state_dict().items()}})

    for eid in rrr_data:
        beta_g = golden.compute_beta(eid).detach().numpy()
        from video_spike_tpu.models.rrr import compute_beta
        np.testing.assert_allclose(
            np.asarray(compute_beta(ours.params, eid)), beta_g,
            rtol=1e-5, atol=1e-6)

        for k in (0, 1):
            _, y_g, yp_g = golden.predict_y_fr(rrr_data, eid, k)
            _, y_o, yp_o = ours.predict_y_fr(rrr_data, eid, k)
            np.testing.assert_allclose(np.asarray(y_o), y_g.numpy(),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(yp_o),
                                       yp_g.detach().numpy(),
                                       rtol=1e-4, atol=1e-4)

    mse_g = golden.compute_MSE_RRRGD(rrr_data, 1)
    mse_o = ours.compute_MSE(rrr_data, 1)
    for eid in rrr_data:
        np.testing.assert_allclose(mse_o[eid], mse_g[eid].detach().numpy(),
                                   rtol=5e-4)


@pytest.mark.parametrize("solver", ["lbfgs", "als"])
def test_rrr_fit_quality_vs_reference_lbfgs(ref_rrr, rrr_data, fitted_ref,
                                            solver):
    """Both of the rebuild's solvers must reach a validation MSE at least
    as good as the reference's own single ``optim.LBFGS.step(closure)``
    fit (``rrr.py:164-202``), within 2% slack for f32 arithmetic."""
    from video_spike_tpu.models.rrr import train_model_main

    _, mse_val_ref = fitted_ref
    golden = float(mse_val_ref["mse_val_mean"].detach())
    _, ours = train_model_main(rrr_data, l2=0.5, n_comp=NCOMP,
                               save=False, solver=solver)
    assert ours["mse_val_mean"] <= golden * 1.02, (
        solver, ours["mse_val_mean"], golden)

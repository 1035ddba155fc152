"""Fused low-rank readout update (ops/fused_readout) vs materialized paths.

The fused step must reproduce ops/optim.adafactor_lean numerics given an
exact-f32 gradient, and its forward split (first Dense + tail_apply) must be
bit-identical to LinearModel.apply. The Pallas kernel (interpret mode on
CPU) must match the pure-XLA fallback bit for bit, including the SR stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from video_spike_tpu.models.linear import LinearModel
from video_spike_tpu.ops import fused_readout as fr
from video_spike_tpu.ops.optim import adafactor_lean, apply_updates_sr
from video_spike_tpu.ops.poisson import poisson_nll_mean

B, M, N = 8, 384, 256


def _factors(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, M)).astype(np.float32))
    dz = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 0.1)
    return x, dz


def test_lowrank_stats_match_materialized():
    x, dz = _factors()
    g = x.T @ dz
    row_sq, col_sq = fr.lowrank_row_col_sq(x, dz)
    np.testing.assert_allclose(row_sq, jnp.sum(g * g, axis=1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(col_sq, jnp.sum(g * g, axis=0),
                               rtol=1e-5, atol=1e-5)


def test_update_survives_roundoff_negative_stats(monkeypatch):
    """Regression (round-3 probe quality gate): the factored statistics are
    mathematically >= 0, but at the production 1.2M-row head their B^2
    mixed-sign f32 sums cancel to tiny negatives (observed: one -34 among
    O(1e10) magnitudes), and rsqrt(negative) wiped the whole kernel row
    with NaN. The update must clamp the stats before rsqrt."""
    x, dz = _factors()
    w = jnp.asarray(np.random.default_rng(2).normal(size=(M, N))
                    .astype(np.float32) * 0.01)
    real = fr.lowrank_row_col_sq

    def negative_roundoff(x_, dz_):
        row_sq, col_sq = real(x_, dz_)
        row_sq = row_sq.at[7].set(-34.0)     # the observed failure mode
        col_sq = col_sq.at[3].set(-1e-3)
        return row_sq, col_sq

    monkeypatch.setattr(fr, "lowrank_row_col_sq", negative_roundoff)
    w2, st = fr.fused_readout_update(w, x, dz, fr.init_fused_state(w),
                                     1e-3, seed=jnp.uint32(0),
                                     use_pallas=False)
    assert bool(jnp.all(jnp.isfinite(w2)))
    assert bool(jnp.all(jnp.isfinite(st.row))) and bool(
        jnp.all(st.row >= 0.0))
    assert bool(jnp.all(jnp.isfinite(st.col))) and bool(
        jnp.all(st.col >= 0.0))


def test_update_matches_adafactor_lean_f32():
    """f32 kernel: 3 fused steps == 3 adafactor_lean steps on exact grads."""
    x, dz = _factors()
    w = jnp.asarray(np.random.default_rng(1).normal(size=(M, N))
                    .astype(np.float32) * 0.01)
    lr = 1e-3

    tx = adafactor_lean(lr)
    w_ref = w
    st_ref = tx.init({"k": w})
    w_fused = w
    st_fused = fr.init_fused_state(w)
    for step in range(3):
        g = x.T @ dz * (step + 1)          # vary the gradient across steps
        upd, st_ref = tx.update({"k": g}, st_ref, {"k": w_ref})
        w_ref = optax.apply_updates({"k": w_ref}, upd)["k"]
        w_fused, st_fused = fr.fused_readout_update(
            w_fused, x * (step + 1), dz, st_fused, lr,
            seed=jnp.uint32(step), use_pallas=False)
        np.testing.assert_allclose(np.asarray(st_fused.row),
                                   np.asarray(st_ref.row["k"]),
                                   rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(w_fused), np.asarray(w_ref),
                                   rtol=2e-5, atol=2e-7)


def test_update_matches_adafactor_lean_bf16_sr_stats():
    """bf16 kernel: the fused SR update stays within one bf16 ulp of the
    f32-exact update and is unbiased across seeds."""
    x, dz = _factors(2)
    w32 = np.random.default_rng(3).normal(size=(M, N)).astype(np.float32)
    w = jnp.asarray(w32).astype(jnp.bfloat16)
    st = fr.init_fused_state(w)
    # exact f32 target for the same step
    w_f32, _ = fr.fused_readout_update(
        w.astype(jnp.float32), x, dz, st, 1e-3, seed=jnp.uint32(0),
        use_pallas=False)
    outs = []
    for seed in range(4):
        w_sr, _ = fr.fused_readout_update(
            w, x, dz, st, 1e-3, seed=jnp.uint32(seed), use_pallas=False)
        assert w_sr.dtype == jnp.bfloat16
        diff = np.abs(w_sr.astype(np.float32) - np.asarray(w_f32))
        ulp = np.abs(np.asarray(w_f32)) * 2 ** -7 + 1e-30
        assert np.all(diff <= ulp * 1.01)
        outs.append(np.asarray(w_sr.astype(jnp.float32)))
    # averaging over independent SR draws should approach the f32 value
    mean_err = np.abs(np.mean(outs, axis=0) - np.asarray(w_f32)).mean()
    one_err = np.abs(outs[0] - np.asarray(w_f32)).mean()
    assert mean_err < one_err


def test_pallas_kernel_matches_xla_bitwise():
    x, dz = _factors(4)
    w = jnp.asarray(np.random.default_rng(5).normal(size=(M, N))
                    .astype(np.float32)).astype(jnp.bfloat16)
    st = fr.init_fused_state(w)
    w_x, st_x = fr.fused_readout_update(w, x, dz, st, 1e-3,
                                        seed=jnp.uint32(7), use_pallas=False)
    w_p, st_p = fr.fused_readout_update(w, x, dz, st, 1e-3,
                                        seed=jnp.uint32(7), use_pallas=True,
                                        interpret=True)
    assert np.array_equal(
        np.asarray(w_x, dtype=np.float32), np.asarray(w_p, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(st_x.row), np.asarray(st_p.row))


def _tiny_model_params():
    # first kernel (1280, 128): both dims >= 128 so the materialized
    # adafactor_lean reference also takes the factored branch
    model = LinearModel(encoder_hidden=(128, 32), encoder_out=16,
                        decoder_hidden=(32,), output_dim=100 * 4)
    x = jnp.asarray(
        np.random.default_rng(6).integers(0, 255, (B, 5, 1, 16, 16),
                                          dtype=np.uint8))
    params = model.init(jax.random.PRNGKey(0),
                        x.reshape(B, -1).astype(jnp.float32))
    return model, params, x


def test_forward_split_matches_model_apply():
    model, params, x = _tiny_model_params()
    flat_in = x.reshape(B, -1)
    ref = model.apply(params, flat_in)
    kernel, rest = fr.split_first_kernel(params)
    flat = fr.preprocess_flat(model, flat_in)
    b1 = rest["params"]["encoder"]["Dense_0"]["bias"]
    z1 = flat @ kernel.astype(model.compute_dtype) \
        + b1.astype(model.compute_dtype)
    out = fr.tail_apply(model, rest, z1)
    assert np.array_equal(np.asarray(ref), np.asarray(out))
    # merge round-trips the tree
    merged = fr.merge_first_kernel(rest, kernel)
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(params)


def test_fused_linear_step_trains():
    """Full fused step: loss decreases and tracks a materialized-grad
    adafactor_lean + SR reference step trajectory."""
    model, params, x = _tiny_model_params()
    flat_in = jnp.asarray(x.reshape(B, -1))
    ap = jnp.asarray(np.random.default_rng(7).poisson(
        1.0, (B, 100, 4)).astype(np.float32))
    lr = 1e-3

    def criterion(out, ap_, n_valid):
        return poisson_nll_mean(out, ap_)

    # reference: materialized grads, same optimizer family on ALL leaves
    tx_all = adafactor_lean(lr)
    p_ref, s_ref = params, tx_all.init(params)

    def ref_step(p, s, seed):
        loss, g = jax.value_and_grad(
            lambda q: criterion(model.apply(q, flat_in), ap, B))(p)
        upd, s = tx_all.update(g, s, p)
        return apply_updates_sr(p, upd, seed), s, loss

    tx_rest = adafactor_lean(lr)
    step = fr.make_fused_linear_step(
        model, tx_rest, lr, criterion, apply_updates_sr, use_pallas=False)
    p_f = params
    o_f = fr.init_fused_opt_state(params, tx_rest)

    losses_ref, losses_f = [], []
    for i in range(5):
        p_ref, s_ref, l_r = ref_step(p_ref, s_ref, jnp.uint32(i))
        p_f, o_f, l_f = step(p_f, o_f, flat_in, ap, B, jnp.uint32(i))
        losses_ref.append(float(l_r))
        losses_f.append(float(l_f))
    assert losses_f[-1] < losses_f[0]
    # same starting loss (identical forward), closely tracking trajectory
    assert losses_f[0] == pytest.approx(losses_ref[0], rel=1e-5)
    assert losses_f[-1] == pytest.approx(losses_ref[-1], rel=2e-2)
    # every parameter leaf still finite, kernel actually moved
    k_new = p_f["params"]["encoder"]["Dense_0"]["kernel"]
    assert np.all(np.isfinite(np.asarray(k_new, dtype=np.float32)))
    assert not np.array_equal(
        np.asarray(k_new, dtype=np.float32),
        np.asarray(params["params"]["encoder"]["Dense_0"]["kernel"],
                   dtype=np.float32))


def test_fused_step_jits_and_donates():
    model, params, x = _tiny_model_params()
    flat_in = jnp.asarray(x.reshape(B, -1))
    ap = jnp.asarray(np.random.default_rng(8).poisson(
        1.0, (B, 100, 4)).astype(np.float32))
    tx_rest = adafactor_lean(1e-3)
    step = fr.make_fused_linear_step(
        model, tx_rest, 1e-3,
        lambda out, ap_, nv: poisson_nll_mean(out, ap_),
        apply_updates_sr, use_pallas=False)
    jstep = jax.jit(step, donate_argnums=(0, 1))
    p, o = params, fr.init_fused_opt_state(params, tx_rest)
    for i in range(2):
        p, o, loss = jstep(p, o, flat_in, ap, B, jnp.uint32(i))
    assert np.isfinite(float(loss))


@pytest.fixture(scope="module")
def tiny_session(tmp_path_factory):
    from video_spike_tpu.data.synthetic import make_synthetic_session
    d = tmp_path_factory.mktemp("fused_e2e")
    make_synthetic_session(d, eid="abcde0000", n_trials=20, n_neurons=6,
                           seed=3, height=32, width=32)
    return d


def test_trainer_fused_readout_end_to_end(tiny_session, tmp_path):
    """optimizer.fused_readout trains through BaseTrainer end-to-end and
    matches the standard adafactor run's quality on the same session."""
    from video_spike_tpu.core.config import config_from_kwargs, update_config
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer

    def run(fused, subdir):
        config = config_from_kwargs(
            {"model": "include:configs/model/linear_of-ws.yaml"})
        config = update_config("configs/train/linear_of-ws.yaml", config)
        config["dirs"]["data_dir"] = str(tiny_session)
        config["training"]["num_epochs"] = 4
        config["training"]["train_batch_size"] = 8
        config["optimizer"]["name"] = "adafactor"
        config["optimizer"]["param_scale"] = False
        config["optimizer"]["clipping"] = None
        config["optimizer"]["param_dtype"] = "bfloat16_sr"
        if fused:
            config["optimizer"]["fused_readout"] = True
            config["optimizer"]["fused_min_kernel"] = 1
        split = split_dataset(str(tiny_session), "abcde0000", seed=0)
        train_dl, val_dl, test_dl = make_loader(config, split)
        meta = get_metadata_from_loader(train_dl, config)
        config["model"]["encoder"]["input_dim"] = meta["input_dim"]
        config["model"]["decoder"]["output_dim"] = meta["output_dim"]
        model = NAME2MODEL[config.model.model_class].from_config(config.model)
        trainer = BaseTrainer(model, train_dl, val_dl, test_dl, config,
                              eid="abcde0000", dataset_split_dict=split,
                              log_dir=str(tmp_path / subdir))
        res = trainer.train()
        return trainer, res

    trainer, res = run(True, "fused")
    assert trainer._fused_inner is not None, "fused step was not engaged"
    assert np.isfinite(res["best_eval_bps"])
    _, res_std = run(False, "std")
    assert res["best_eval_bps"] > res_std["best_eval_bps"] - 0.2, (
        res["best_eval_bps"], res_std["best_eval_bps"])


def test_fused_probe_head_step_matches_standard():
    """VideoMAEProbe head: fused step tracks the materialized-grad
    adafactor_lean head-only step (f32 params -> exact SR-free adds)."""
    from video_spike_tpu.models.videomae import VideoMAEProbe
    cfg = dict(image_size=32, patch_size=8, num_channels=3, num_frames=8,
               tubelet_size=2, hidden_size=32, num_hidden_layers=1,
               num_attention_heads=4, intermediate_size=64,
               # encoder head 128-wide so min(shape) >= 128 puts the
               # materialized reference on the factored branch too
               encoder={"output_dim": 128}, decoder={"output_dim": 100 * 4})
    model = VideoMAEProbe(config=cfg)
    rng = np.random.default_rng(11)
    video = jnp.asarray(rng.integers(0, 255, (4, 120, 1, 32, 32),
                                     dtype=np.uint8))
    params = model.init(jax.random.PRNGKey(0), video)
    hidden = model.apply(params, video, method="encode")
    assert hidden.shape[0] == 4 and hidden.ndim == 3
    ap = jnp.asarray(rng.poisson(1.0, (4, 100, 4)).astype(np.float32))
    lr = 1e-3

    def criterion(out, ap_, nv):
        return poisson_nll_mean(out, ap_)

    tx_all = adafactor_lean(lr)
    p_ref, s_ref = params, tx_all.init(params)

    def ref_step(p, s, seed):
        loss, g = jax.value_and_grad(lambda q: criterion(
            model.apply(q, hidden, method="head"), ap, 4))(p)
        upd, s = tx_all.update(g, s, p)
        return apply_updates_sr(p, upd, seed), s, loss

    tx_rest = adafactor_lean(lr)
    step = fr.make_fused_probe_head_step(
        model, tx_rest, lr, criterion, apply_updates_sr, use_pallas=False)
    p_f = params
    o_f = fr.init_fused_opt_state(params, tx_rest,
                                  split=fr.split_head_kernel)
    for i in range(5):
        p_ref, s_ref, l_r = ref_step(p_ref, s_ref, jnp.uint32(i))
        p_f, o_f, l_f = step(p_f, o_f, hidden, ap, 4, jnp.uint32(i))
        assert float(l_f) == pytest.approx(float(l_r), rel=3e-3), i
    k_ref = np.asarray(p_ref["params"]["encoder_head"]["kernel"])
    k_f = np.asarray(p_f["params"]["encoder_head"]["kernel"])
    np.testing.assert_allclose(k_f, k_ref, rtol=5e-3, atol=1e-6)
    # the frozen backbone is untouched by the fused step
    b_ref = np.asarray(jax.tree.leaves(
        params["params"]["video_mae"])[0])
    b_f = np.asarray(jax.tree.leaves(
        p_f["params"]["video_mae"])[0])
    assert np.array_equal(b_ref, b_f)


def test_fused_opt_state_checkpoint_roundtrip(tiny_session, tmp_path):
    """model_last with the fused (FusedReadoutState, rest) opt_state must
    survive an orbax save/restore and resume training."""
    from video_spike_tpu.core.config import config_from_kwargs, update_config
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer

    def build(log_dir):
        config = config_from_kwargs(
            {"model": "include:configs/model/linear_of-ws.yaml"})
        config = update_config("configs/train/linear_of-ws.yaml", config)
        config["dirs"]["data_dir"] = str(tiny_session)
        config["training"]["num_epochs"] = 2
        config["training"]["train_batch_size"] = 8
        config["optimizer"]["name"] = "adafactor"
        config["optimizer"]["param_scale"] = False
        config["optimizer"]["clipping"] = None
        config["optimizer"]["fused_readout"] = True
        config["optimizer"]["fused_min_kernel"] = 1
        split = split_dataset(str(tiny_session), "abcde0000", seed=0)
        train_dl, val_dl, test_dl = make_loader(config, split)
        meta = get_metadata_from_loader(train_dl, config)
        config["model"]["encoder"]["input_dim"] = meta["input_dim"]
        config["model"]["decoder"]["output_dim"] = meta["output_dim"]
        model = NAME2MODEL[config.model.model_class].from_config(
            config.model)
        return BaseTrainer(model, train_dl, val_dl, test_dl, config,
                           eid="abcde0000", dataset_split_dict=split,
                           log_dir=log_dir)

    log_dir = str(tmp_path / "run")
    t1 = build(log_dir)
    t1.train()
    assert t1._fused_inner is not None
    count1 = int(jax.device_get(t1.opt_state[0].count))
    assert count1 > 0

    t2 = build(log_dir)
    assert t2.resume()
    fstate = t2.opt_state[0]
    assert type(fstate).__name__ == "FusedReadoutState"
    assert int(jax.device_get(fstate.count)) == count1
    np.testing.assert_allclose(np.asarray(jax.device_get(fstate.row)),
                               np.asarray(jax.device_get(t1.opt_state[0].row)))
    # and training continues from the restored state
    res = t2.train_epoch()
    assert np.isfinite(res["train_loss"])


def test_light_eval_matches_host_eval(tiny_session, tmp_path):
    """The on-device eval metrics path must agree with the host
    metrics_list path on the same params (bps/rsquared/loss)."""
    from video_spike_tpu.core.config import config_from_kwargs, update_config
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer

    config = config_from_kwargs(
        {"model": "include:configs/model/linear_of-ws.yaml"})
    config = update_config("configs/train/linear_of-ws.yaml", config)
    config["dirs"]["data_dir"] = str(tiny_session)
    config["training"]["num_epochs"] = 2
    config["training"]["train_batch_size"] = 8
    split = split_dataset(str(tiny_session), "abcde0000", seed=0)
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["encoder"]["input_dim"] = meta["input_dim"]
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL[config.model.model_class].from_config(config.model)
    trainer = BaseTrainer(model, train_dl, val_dl, test_dl, config,
                          eid="abcde0000", dataset_split_dict=split,
                          log_dir=str(tmp_path))
    trainer.train_epoch()

    light = trainer.eval_epoch()
    assert "eval_gt" not in light, "light path must not fetch arrays"
    # force the host path on identical params via save_plot
    trainer.config["save_plot"] = True
    trainer._eval_input_cache = None    # host path restages (ap rows kept)
    host = trainer.eval_epoch()
    assert "eval_gt" in host
    for k in ("eval_bps", "eval_rsquared", "eval_loss"):
        assert light["eval_res"][k] == pytest.approx(
            host["eval_res"][k], abs=3e-4), k


def test_pallas_contract_rejects_f32_and_untileable():
    """use_pallas=True is an explicit A/B knob: non-bf16 kernels (the XLA
    path preserves their dtype; the kernel would downcast) and M not
    divisible by 8 raise instead of silently misbehaving."""
    x, dz = _factors(8)
    w32 = jnp.asarray(np.random.default_rng(9).normal(size=(M, N))
                      .astype(np.float32))
    st = fr.init_fused_state(w32)
    with pytest.raises(ValueError, match="bf16"):
        fr.fused_readout_update(w32, x, dz, st, 1e-3, seed=jnp.uint32(0),
                                use_pallas=True, interpret=True)
    w_odd = jnp.asarray(np.random.default_rng(10)
                        .normal(size=(M + 1, N))
                        .astype(np.float32)).astype(jnp.bfloat16)
    x_odd = jnp.concatenate([x, x[:, :1]], axis=1)
    with pytest.raises(ValueError, match="divisible by 8"):
        fr.fused_readout_update(w_odd, x_odd, dz, fr.init_fused_state(w_odd),
                                1e-3, seed=jnp.uint32(0), use_pallas=True,
                                interpret=True)


def _build_probe_trainer(tmp_path, opt_overrides):
    """Tiny VideoMAEProbe BaseTrainer (mirrors test_videomae's TINY shrink)."""
    from video_spike_tpu.core.config import config_from_kwargs, update_config
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.data.synthetic import make_synthetic_session
    from video_spike_tpu.train.base import BaseTrainer

    tiny = dict(image_size=32, patch_size=8, num_channels=3, num_frames=8,
                tubelet_size=2, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                encoder={"output_dim": 16}, decoder={"output_dim": 100 * 4})
    data_dir = tmp_path / "data"
    make_synthetic_session(data_dir, eid="fusedprobe", n_trials=16,
                           n_neurons=4, seed=3, height=32, width=32)
    config = config_from_kwargs(
        {"model": "include:configs/model/videomae/videomae.yaml"})
    config = update_config("configs/train/vmae_video.yaml", config)
    config["dirs"]["data_dir"] = str(data_dir)
    config["training"]["num_epochs"] = 1
    config["training"]["train_batch_size"] = 8
    for k, v in tiny.items():
        config["model"][k] = v
    for k, v in opt_overrides.items():
        config["optimizer"][k] = v
    split = split_dataset(str(data_dir), "fusedprobe", seed=0)
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL[config.model.model_class].from_config(config.model)
    return BaseTrainer(model, train_dl, val_dl, test_dl, config,
                       eid="fusedprobe", dataset_split_dict=split,
                       log_dir=str(tmp_path / "log"))


def test_trainer_engages_fused_probe_head(tmp_path):
    """Regression: optimizer.fused_readout on the frozen VideoMAEProbe must
    reach the fused head branch through BaseTrainer (the round-3 guard
    disabled it for every frozen-path model, making the branch dead code),
    train finitely, and keep the frozen backbone bit-stable."""
    t = _build_probe_trainer(tmp_path, dict(
        name="adafactor", param_scale=False, clipping=None,
        fused_readout=True, fused_min_kernel=1))
    assert t._fused_readout and t._frozen_split
    res = t.train_epoch()
    assert t._fused_inner is not None and t._fused_is_head
    assert np.isfinite(res["train_loss"])
    backbone_1 = jax.tree.map(np.asarray, t.params["params"]["video_mae"])
    head_1 = jax.tree.map(np.asarray, t.params["params"]["encoder_head"])
    t.train_epoch()
    for a, b in zip(jax.tree.leaves(backbone_1),
                    jax.tree.leaves(t.params["params"]["video_mae"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(float(np.abs(a - np.asarray(b)).max()) > 0
               for a, b in zip(jax.tree.leaves(head_1),
                               jax.tree.leaves(
                                   t.params["params"]["encoder_head"])))
    # the fused opt_state really is the (FusedReadoutState, rest) pair
    assert type(t.opt_state[0]).__name__ == "FusedReadoutState"
    assert int(jax.device_get(t.opt_state[0].count)) > 0


def test_fused_readout_requires_adafactor(tmp_path):
    """fused_readout implements adafactor numerics; with any other
    optimizer it must disable itself rather than silently train the giant
    kernel with different numerics than configured."""
    t = _build_probe_trainer(tmp_path, dict(fused_readout=True,
                                            fused_min_kernel=1))
    assert not t._fused_readout      # vmae config default is adamw
    res = t.train_epoch()
    assert t._fused_inner is None
    assert np.isfinite(res["train_loss"])

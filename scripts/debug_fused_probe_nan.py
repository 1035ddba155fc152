"""Dissect the first fused probe-head step at production scale.

The probe quality gate (scripts/quality_gate_optimizer.py --suite probe)
found the fused head update NaNs at the (1204224, 256) kernel scale while
the materialized arm trains cleanly. This script rebuilds the failing arm's
trainer on the same fixture, stages the frozen features, then runs the
fused step's internals one expression at a time, printing finiteness and
magnitude of every intermediate so the first inf/NaN is localized.

    python scripts/debug_fused_probe_nan.py --fixture /tmp/optgate_*/fixture
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def stats(name, x):
    x = np.asarray(jax.device_get(x)).astype(np.float64)
    finite = np.isfinite(x)
    msg = (f"{name:14s} shape={x.shape} finite={finite.mean()*100:.2f}% "
           f"|max|={np.abs(x[finite]).max() if finite.any() else float('nan'):.4g} "
           f"rms={np.sqrt(np.mean(x[finite]**2)) if finite.any() else float('nan'):.4g}")
    print(msg, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", required=True)
    args = ap.parse_args()

    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()

    from video_spike_tpu.core.config import config_from_kwargs, update_config
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer
    from video_spike_tpu.ops import fused_readout as fr

    config = config_from_kwargs(
        {"model": "include:configs/model/videomae/videomae.yaml"})
    config = update_config("configs/train/vmae_video.yaml", config)
    config["dirs"]["data_dir"] = args.fixture
    config["training"]["num_epochs"] = 1
    for k, v in dict(name="adafactor", param_scale=False, clipping=None,
                     param_dtype="bfloat16_sr", lr=2.0e-06,
                     fused_readout=True).items():
        config["optimizer"][k] = v
    split = split_dataset(args.fixture, "qualeid000", seed=42)
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL[config.model.model_class].from_config(config.model)
    t = BaseTrainer(model, train_dl, val_dl, test_dl, config,
                    eid="qualeid000", dataset_split_dict=split,
                    log_dir="/tmp/debug_fused_probe_logs")
    batch0 = next(iter(train_dl))
    t._init_if_needed(t._assemble_inputs(batch0))
    assert t._fused_inner is not None and t._fused_is_head

    # stage exactly like the trainer (raw trials -> frozen features)
    assert t._stage_device_dataset()
    # _stage_device_dataset runs inside train(); replicate the feature swap
    X_all, A_all = t._dev_data
    if X_all.dtype != jnp.bfloat16 or X_all.ndim > 3:
        F = t._encode_staged_trials()
        assert F is not None
        t._dev_data = (F, A_all)
    F, A_all = t._dev_data
    stats("features F", F)
    stats("ap A", A_all)

    B = int(config.training.train_batch_size)
    idx = jnp.arange(B, dtype=jnp.int32)
    hidden = jnp.take(F, idx, axis=0)
    ap_b = jnp.take(A_all, idx, axis=0)
    n_valid = jnp.float32(B)
    seed = jnp.uint32(12345)

    params, opt_state = t.params, t.opt_state
    fstate, rest_state = opt_state
    kernel, rest = fr.split_head_kernel(params)
    stats("kernel W1", kernel)
    b = hidden.shape[0]
    flat = hidden.reshape(b, -1).astype(jnp.float32)
    stats("flat x", flat)
    z_nob = flat @ kernel.astype(jnp.float32)
    stats("z_nob", z_nob)

    out_dim = model.config["decoder"]["output_dim"]
    criterion = t.criterion

    def loss_rest(rest_p, z_):
        b1 = rest_p["params"]["encoder_head"]["bias"]
        z1 = z_ + b1.astype(jnp.float32)
        dec = rest_p["params"]["decoder_head"]
        out = (z1 @ dec["kernel"].astype(jnp.float32)
               + dec["bias"].astype(jnp.float32))
        out = out.reshape(b, 100, out_dim // 100)
        return criterion(out, ap_b, n_valid)

    loss, (g_rest, dz) = jax.jit(jax.value_and_grad(
        loss_rest, argnums=(0, 1)))(rest, z_nob)
    print(f"loss step1 = {float(loss)}", flush=True)
    stats("dz", dz)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_rest):
        stats("g_rest" + jax.tree_util.keystr(path)[-24:], leaf)

    # --- fused update internals, eagerly ---
    row_sq, col_sq = jax.jit(fr.lowrank_row_col_sq)(flat, dz)
    stats("row_sq", row_sq)
    stats("col_sq", col_sq)
    m, n = kernel.shape
    eps = 1e-30
    r = row_sq / n + eps
    c = col_sq / m + eps
    print(f"mean(r)={float(jnp.mean(r))}, mean(c)={float(jnp.mean(c))}",
          flush=True)
    a = jax.lax.rsqrt(r / jnp.mean(r))
    lr_t = t.schedule(0) if callable(t.schedule) else config.optimizer.lr
    bcol = jax.lax.rsqrt(c) * (-jnp.float32(lr_t))
    stats("a rowscale", a)
    stats("b colscale", bcol)
    xa = flat * a[None, :]
    dzc = dz.astype(jnp.float32) * bcol[None, :]
    stats("xa", xa)
    stats("dzc", dzc)
    upd = jax.jit(lambda xa_, dzc_: jax.lax.dot_general(
        xa_, dzc_, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))(xa, dzc)
    stats("upd", upd)
    new_kernel, fstate2 = jax.jit(
        lambda k, f, d, s: fr.fused_readout_update(
            k, f, d, s, t.schedule, seed=seed))(kernel, flat, dz, fstate)
    stats("new kernel", new_kernel)
    stats("fstate.row", fstate2.row)
    stats("fstate.col", fstate2.col)

    # --- rest-tree update ---
    upd_rest, _ = jax.jit(t.tx.update)(g_rest, rest_state, rest)
    for path, leaf in jax.tree_util.tree_leaves_with_path(upd_rest):
        stats("upd_rest" + jax.tree_util.keystr(path)[-24:], leaf)
    rest2 = t._apply_updates(rest, upd_rest, seed)
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            rest2["params"]["encoder_head"]):
        stats("rest2.enc_head" + jax.tree_util.keystr(path)[-16:], leaf)
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            rest2["params"]["decoder_head"]):
        stats("rest2.dec_head" + jax.tree_util.keystr(path)[-16:], leaf)
    # backbone finiteness after one rest update (wd must not corrupt it)
    bb = jax.tree.leaves(rest2["params"]["video_mae"])
    bb_fin = all(bool(jnp.all(jnp.isfinite(
        x.astype(jnp.float32)))) for x in bb)
    print(f"backbone finite after rest update: {bb_fin}", flush=True)

    # --- loss at step 2 with the updated params ---
    params2 = fr.merge_head_kernel(rest2, new_kernel)
    idx2 = jnp.arange(B, 2 * B, dtype=jnp.int32) % F.shape[0]
    hidden2 = jnp.take(F, idx2, axis=0)
    ap2 = jnp.take(A_all, idx2, axis=0)
    kernel2, rest_chk = fr.split_head_kernel(params2)
    flat2 = hidden2.reshape(B, -1).astype(jnp.float32)
    z2 = flat2 @ kernel2.astype(jnp.float32)
    stats("z step2", z2)

    def loss2(rest_p, z_):
        b1 = rest_p["params"]["encoder_head"]["bias"]
        z1 = z_ + b1.astype(jnp.float32)
        dec = rest_p["params"]["decoder_head"]
        out = (z1 @ dec["kernel"].astype(jnp.float32)
               + dec["bias"].astype(jnp.float32))
        out = out.reshape(B, 100, out_dim // 100)
        return criterion(out, ap2, n_valid)

    print(f"loss step2 = {float(jax.jit(loss2)(rest_chk, z2))}", flush=True)


if __name__ == "__main__":
    main()

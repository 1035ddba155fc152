"""Verify the fused-probe NaN mechanism: roundoff-negative row_sq/col_sq.

Follow-up to debug_fused_probe_nan.py: prints exact nonfinite/negative
counts for the factored statistics and the poisoned tensors.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


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
                    log_dir="/tmp/debug_fused_probe_logs2")
    batch0 = next(iter(train_dl))
    t._init_if_needed(t._assemble_inputs(batch0))
    assert t._stage_device_dataset()
    X_all, A_all = t._dev_data
    if X_all.dtype != jnp.bfloat16 or X_all.ndim > 3:
        F = t._encode_staged_trials()
        t._dev_data = (F, A_all)
    F, A_all = t._dev_data
    nan_f = int(jnp.sum(~jnp.isfinite(F.astype(jnp.float32))))
    print(f"F nonfinite count: {nan_f} / {F.size}", flush=True)

    B = int(config.training.train_batch_size)
    idx = jnp.arange(B, dtype=jnp.int32)
    hidden = jnp.take(F, idx, axis=0)
    ap_b = jnp.take(A_all, idx, axis=0)
    n_valid = jnp.float32(B)

    kernel, rest = fr.split_head_kernel(t.params)
    flat = hidden.reshape(B, -1).astype(jnp.float32)
    z_nob = flat @ kernel.astype(jnp.float32)
    out_dim = model.config["decoder"]["output_dim"]
    criterion = t.criterion

    def loss_rest(rest_p, z_):
        b1 = rest_p["params"]["encoder_head"]["bias"]
        z1 = z_ + b1.astype(jnp.float32)
        dec = rest_p["params"]["decoder_head"]
        out = (z1 @ dec["kernel"].astype(jnp.float32)
               + dec["bias"].astype(jnp.float32))
        out = out.reshape(B, 100, out_dim // 100)
        return criterion(out, ap_b, n_valid)

    _, (_, dz) = jax.jit(jax.value_and_grad(
        loss_rest, argnums=(0, 1)))(rest, z_nob)

    row_sq, col_sq = jax.jit(fr.lowrank_row_col_sq)(flat, dz)
    r_neg = int(jnp.sum(row_sq < 0))
    c_neg = int(jnp.sum(col_sq < 0))
    print(f"row_sq negatives: {r_neg} / {row_sq.size}, "
          f"min={float(jnp.min(row_sq)):.6g}", flush=True)
    print(f"col_sq negatives: {c_neg} / {col_sq.size}, "
          f"min={float(jnp.min(col_sq)):.6g}", flush=True)

    eps = 1e-30
    r = row_sq / kernel.shape[1] + eps
    a = jax.lax.rsqrt(r / jnp.mean(r))
    a_nan = int(jnp.sum(~jnp.isfinite(a)))
    print(f"a nonfinite: {a_nan} / {a.size}", flush=True)

    new_kernel, _ = jax.jit(
        lambda k, f, d, s: fr.fused_readout_update(
            k, f, d, s, t.schedule, seed=jnp.uint32(12345)))(
        kernel, flat, dz, fr.init_fused_state(kernel))
    k_nan = int(jnp.sum(~jnp.isfinite(new_kernel.astype(jnp.float32))))
    # rows fully poisoned?
    row_nan = int(jnp.sum(jnp.any(
        ~jnp.isfinite(new_kernel.astype(jnp.float32)), axis=1)))
    print(f"new kernel nonfinite: {k_nan} / {new_kernel.size} "
          f"({row_nan} rows touched)", flush=True)


if __name__ == "__main__":
    main()

"""Multi-process run of the REAL supervised trainer (not a toy step).

Two (or more) processes each load their host-local shard of a synthetic
session's training trials, run ``BaseTrainer.train()`` for a few epochs over
the global mesh, and print their per-epoch train/eval losses. Because the
loss is a global mean over the sharded batch, every process must print the
SAME numbers — ``tests/test_multiprocess_dcn.py`` asserts that equality plus
the process-0-only checkpoint artifacts.

    JAX_COORDINATOR_ADDRESS=localhost:12345 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=<i> DCN_FIXTURE_DIR=... DCN_LOG_DIR=... \
    python -m video_spike_tpu.parallel.dcn_trainer_smoke

This is the production multi-host path (SURVEY.md §5.8): the reference's
per-rank DataLoader + DDP all-reduce becomes host-local loading +
``jax.make_array_from_process_local_data`` + XLA collectives.
"""

from __future__ import annotations

import json
import os


def main() -> None:
    import jax

    if os.environ.get("DCN_SMOKE_FAULTHANDLER"):
        import faulthandler
        faulthandler.dump_traceback_later(
            int(os.environ["DCN_SMOKE_FAULTHANDLER"]), repeat=True)

    if os.environ.get("DCN_SMOKE_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass

    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()

    from video_spike_tpu.core.config import config_from_kwargs, update_config
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.parallel import multihost as mh
    from video_spike_tpu.train.base import BaseTrainer

    pid = jax.process_index()
    log_dir = os.environ["DCN_LOG_DIR"]
    eid = os.environ.get("DCN_EID", "dcntrain00")

    if os.environ.get("DCN_MODE") == "ssl":
        _ssl(jax, os.environ["DCN_H5"], log_dir, eid)
        return
    data_dir = os.environ["DCN_FIXTURE_DIR"]
    if os.environ.get("DCN_MODE") == "multisession":
        _multisession(jax, data_dir, log_dir, eid.split(","))
        return

    config = config_from_kwargs(
        {"model": "include:configs/model/linear_me.yaml"})
    config = update_config("configs/train/linear_me.yaml", config)
    config["dirs"]["data_dir"] = data_dir
    config["training"]["num_epochs"] = 2
    config["training"]["train_batch_size"] = 2 * jax.local_device_count()
    # DCN_DEVICE_CACHE gates the multihost HBM trial cache so the test can
    # compare the cached and streaming paths head-to-head
    config["training"]["device_cache"] = (
        os.environ.get("DCN_DEVICE_CACHE", "1") != "0")

    split = split_dataset(data_dir, eid, seed=42)
    # host-local training shard; val/test stay replicated on every process
    local_split = dict(split)
    local_split["train"] = mh.shard_files_for_process(split["train"])
    train_dl, val_dl, test_dl = make_loader(config, local_split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["encoder"]["input_dim"] = meta["input_dim"]
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL[config.model.model_class].from_config(config.model)

    trainer = BaseTrainer(model, train_dl, val_dl, test_dl, config,
                          eid=eid, dataset_split_dict=split,
                          log_dir=log_dir, seed=42)
    assert trainer._multihost, "expected a multi-process runtime"
    res = trainer.train()
    out = {"best_eval_bps": res["best_eval_bps"],
           "test_bps": res["test_res"]["test_bps"],
           "test_loss": res["test_res"]["test_loss"],
           "cached": trainer._dev_data is not None,
           "h2d_bytes": int(getattr(trainer, "_cached_mh_h2d_bytes", 0))}
    print(f"pid={pid} result={json.dumps(out)}", flush=True)


def _multisession(jax, data_dir: str, log_dir: str, eids) -> None:
    """2 epochs of the REAL MultiSessionTrainer over the global mesh:
    host-local per-session shards feed mixed-session global batches."""
    from video_spike_tpu.core.config import DictConfig
    from video_spike_tpu.models.vtt import VideoTemporalTransformer
    from video_spike_tpu.train.multisession import MultiSessionTrainer

    pid = jax.process_index()
    config = DictConfig({
        "training": {"num_epochs": 2,
                     "train_batch_size": 2 * jax.local_device_count(),
                     "test_batch_size": 2 * jax.local_device_count()},
        "optimizer": {"lr": 1e-3, "wd": 0.01, "eps": 1e-8,
                      "warmup_pct": 0.15, "div_factor": 10},
    })
    trainer = MultiSessionTrainer(model=None, config=config, eids=eids,
                                  data_dir=data_dir, log_dir=log_dir,
                                  seed=42)
    trainer.model = VideoTemporalTransformer.from_config({
        "n_sessions": len(eids), "max_neurons": trainer.max_neurons,
        "t_frames": 120, "t_bins": 100, "patch_size": 16,
        "hidden_size": 32, "frame_depth": 1, "temporal_depth": 1,
        "num_attention_heads": 2, "intermediate_size": 64,
        # the smoke checks cross-process metric equality, not quality;
        # encoding 30 of 120 frames quarters the dominant CPU cost
        "frame_stride": 4})
    assert trainer._multihost, "expected a multi-process runtime"
    res = trainer.train()
    print(f"pid={pid} result="
          f"{json.dumps({'best_eval_bps': res['best_eval_bps'], 'test_bps': res['test']['test_bps']})}",
          flush=True)


def _ssl(jax, h5_path: str, log_dir: str, eid: str) -> None:
    """A real multi-process ``ContrastTrainer.fit()`` — the TPU-native
    equivalent of the reference's only multi-device path (3-process DDP
    pretrain, ``/root/reference/src/pretrain.py:51-57``): rank-strided frame
    shards feed global triplet batches; the nested-RRR validation and the
    best checkpoint must agree bit-for-bit on every rank."""
    import json

    import numpy as np

    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.contrast import make_contrast_loader
    from video_spike_tpu.train.contrast import ContrastTrainer

    pid = jax.process_index()
    cfg = dict(image_size=16, patch_size=8, num_channels=1, hidden_size=32,
               num_hidden_layers=1, num_attention_heads=4,
               intermediate_size=64, decoder_hidden_size=32,
               decoder_num_hidden_layers=1, decoder_num_attention_heads=4,
               decoder_intermediate_size=64, mask_ratio=0.0,
               norm_pix_loss=False, embed_size=3)
    model = NAME2MODEL["ContrastViT"].from_config(cfg)
    common = dict(eid=eid, idx_offset=3, image_size=16, seed=0)
    dl, _ = make_contrast_loader(h5_path, mode="pretrain", batch_size=4,
                                 **common)
    train_dl, _ = make_contrast_loader(h5_path, mode="train", batch_size=4,
                                       shuffle=False, **common)
    val_dl, _ = make_contrast_loader(h5_path, mode="val", batch_size=4,
                                     shuffle=False, **common)
    trainer = ContrastTrainer(
        model, dl, {"lr": 1e-3}, val_data_loader=val_dl,
        train_data_loader=train_dl, max_steps=6, eid=eid,
        log_dir=log_dir, image_size=16, seed=42, validate_every=3)
    assert trainer._multihost, "expected a multi-process runtime"
    best = trainer.fit()
    emb = trainer.transform(train_dl)  # replicated-eval + all-gather path
    print(f"pid={pid} result="
          f"{json.dumps({'best_bps': round(float(best), 8), 'emb_sum': round(float(np.abs(emb).sum()), 4), 'emb_rows': int(emb.shape[0])})}",
          flush=True)


if __name__ == "__main__":
    main()

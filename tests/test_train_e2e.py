"""End-to-end supervised training on a synthetic session (CPU mesh)."""

import numpy as np
import pytest

from video_spike_tpu.core.config import update_config
from video_spike_tpu.data.synthetic import make_synthetic_session


@pytest.fixture(scope="module")
def tiny_session(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    make_synthetic_session(d, eid="abcde0000", n_trials=20, n_neurons=6,
                           seed=3, height=32, width=32)
    return d


def test_cli_train_end_to_end(tiny_session, tmp_path):
    from video_spike_tpu.cli.train import main

    res = main([
        "--model_config", "configs/model/linear_of-ws.yaml",
        "--train_config", "configs/train/linear_of-ws.yaml",
        "--eid", "abcde0000",
        "--data_dir", str(tiny_session),
        "--num_epochs", "3",
        "--batch_size", "8",
        "--log_dir", str(tmp_path),
    ])
    assert res["best_epoch"] >= 0
    assert np.isfinite(res["best_eval_bps"])
    assert res["test_res"] is not None
    # artifact contract: model_best / model_last / test_results.npy
    log_dir = tmp_path / "abcde" / "wheel-speed_whisker-of" / "LinearModel"
    assert (log_dir / "model_best").exists()
    assert (log_dir / "model_last").exists()
    assert (log_dir / "test_results.npy").exists()
    saved = np.load(log_dir / "test_results.npy", allow_pickle=True).item()
    assert "test_res" in saved and "test_bps" in saved["test_res"]


def test_eval_every_controls_cadence(tiny_session, tmp_path, monkeypatch):
    """training.eval_every=N evaluates every Nth epoch plus the final one."""
    from video_spike_tpu.core.config import config_from_kwargs
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer

    config = config_from_kwargs(
        {"model": "include:configs/model/linear_of-ws.yaml"})
    config = update_config("configs/train/linear_of-ws.yaml", config)
    config["dirs"]["data_dir"] = str(tiny_session)
    config["training"]["num_epochs"] = 5
    config["training"]["train_batch_size"] = 8
    config["training"]["eval_every"] = 3

    split = split_dataset(str(tiny_session), "abcde0000", seed=0)
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["encoder"]["input_dim"] = meta["input_dim"]
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL[config.model.model_class].from_config(config.model)
    trainer = BaseTrainer(model, train_dl, val_dl, test_dl, config,
                          eid="abcde0000", dataset_split_dict=split,
                          log_dir=str(tmp_path))
    calls = []
    orig = trainer.eval_epoch
    monkeypatch.setattr(trainer, "eval_epoch",
                        lambda: calls.append(1) or orig())
    trainer.train()
    assert len(calls) == 3  # epochs 0, 3, and the final epoch 4


@pytest.mark.slow
def test_pretrain_videomae_then_probe(tiny_session, tmp_path):
    """pretrain_videomae CLI -> probe training with pretrained_backbone:
    the zero-egress replacement for the reference's MCG-NJU download."""
    import yaml
    from video_spike_tpu.cli.pretrain_videomae import main as pretrain_main
    from video_spike_tpu.cli.train import main as train_main

    tiny_model = {
        "model_class": "VideoMAE",
        "image_size": 32, "patch_size": 8, "num_channels": 3,
        "num_frames": 4, "tubelet_size": 2, "hidden_size": 16,
        "num_hidden_layers": 1, "num_attention_heads": 2,
        "intermediate_size": 32,
        "pretrained_backbone": None, "freeze_backbone": True,
        "hf_compat": False,
        "encoder": {"output_dim": 8}, "decoder": {"output_dim": None},
    }
    model_yaml = tmp_path / "tiny_vmae.yaml"
    model_yaml.write_text(yaml.safe_dump(tiny_model))

    ckpt = pretrain_main([
        "--model_config", str(model_yaml),
        "--train_config", "configs/train/vmae_video.yaml",
        "--eid", "abcde0000",
        "--data_dir", str(tiny_session),
        "--max_steps", "4",
        "--batch_size", "4",
        "--mask_ratio", "0.5",
        "--log_dir", str(tmp_path),
    ])
    assert (tmp_path / "abcde" / "VideoMAEPretrain" / "backbone").exists()

    tiny_model["pretrained_backbone"] = str(ckpt)
    model_yaml.write_text(yaml.safe_dump(tiny_model))
    res = train_main([
        "--model_config", str(model_yaml),
        "--train_config", "configs/train/vmae_video.yaml",
        "--eid", "abcde0000",
        "--data_dir", str(tiny_session),
        "--num_epochs", "2",
        "--batch_size", "4",
        "--log_dir", str(tmp_path / "probe"),
    ])
    assert np.isfinite(res["best_eval_bps"])


def test_trainer_learns(tiny_session, tmp_path):
    """Loss must drop substantially over epochs on a learnable fixture."""
    from video_spike_tpu.core.config import config_from_kwargs
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer

    config = config_from_kwargs(
        {"model": "include:configs/model/linear_of-ws.yaml"})
    config = update_config("configs/train/linear_of-ws.yaml", config)
    config["dirs"]["data_dir"] = str(tiny_session)
    config["training"]["num_epochs"] = 12
    config["training"]["train_batch_size"] = 8
    config["optimizer"]["lr"] = 3e-3  # fast convergence for the test

    split = split_dataset(str(tiny_session), "abcde0000", seed=0)
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["encoder"]["input_dim"] = meta["input_dim"]
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL[config.model.model_class].from_config(config.model)

    trainer = BaseTrainer(model, train_dl, val_dl, test_dl, config,
                          eid="abcde0000", dataset_split_dict=split,
                          log_dir=str(tmp_path))
    first = trainer.train_epoch()["train_loss"]
    for _ in range(11):
        last = trainer.train_epoch()["train_loss"]
    assert last < first - 0.05, f"no learning: {first} -> {last}"
    ev = trainer.eval_epoch()
    assert ev["eval_res"]["eval_bps"] > -1.0


def test_train_with_bf16_sr_params(tiny_session, tmp_path):
    """optimizer.param_dtype=bfloat16_sr trains end-to-end: big leaves are
    stored bf16, updates are stochastically rounded, quality stays in line
    with the f32 run on the same session."""
    import jax.numpy as jnp
    from video_spike_tpu.core.config import config_from_kwargs
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer

    def run(param_dtype, subdir):
        config = config_from_kwargs(
            {"model": "include:configs/model/linear_of-ws.yaml"})
        config = update_config("configs/train/linear_of-ws.yaml", config)
        config["dirs"]["data_dir"] = str(tiny_session)
        config["training"]["num_epochs"] = 4
        config["training"]["train_batch_size"] = 8
        if param_dtype:
            config["optimizer"]["param_dtype"] = param_dtype
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

    trainer, res = run("bfloat16_sr", "sr")
    # the big kernels really are stored bf16 (small leaves stay f32)
    import jax
    leaves = jax.tree.leaves(trainer.params)
    assert any(l.dtype == jnp.bfloat16 for l in leaves)
    assert any(l.dtype == jnp.float32 for l in leaves)
    assert np.isfinite(res["best_eval_bps"])

    _, res32 = run(None, "f32")
    # same session, same recipe: SR quality within noise of f32
    assert res["best_eval_bps"] > res32["best_eval_bps"] - 0.2, (
        res["best_eval_bps"], res32["best_eval_bps"])

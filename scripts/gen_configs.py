"""Generate the configs/ YAML tree.

Mirrors the reference's config surface (13 train x 12 model YAMLs keyed by
input modality, ``/root/reference/config/``) without hand-writing each file.
Run from the repo root: ``python scripts/gen_configs.py``.
"""

from __future__ import annotations

import copy
from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parent.parent
CFG = ROOT / "configs"

ALL_MODALITIES = [
    "ap", "video", "whisker-video", "choice", "block", "wheel-speed",
    "whisker-motion-energy", "whisker-of", "whisker-of-2d",
    "whisker-of-video", "whole-of", "whole-of-2d", "whole-of-video",
    "marker", "timestamp",
]

TRAIN_BASE = {
    "seed": 42,
    "wandb": {"use": False, "entity": None, "project": "ibl-video"},
    "dirs": {
        "checkpoint_dir": "checkpoints",
        "log_dir": "results",
        "data_dir": "data/ibl-video",
    },
    "training": {
        "num_epochs": 200,
        "train_batch_size": 16,
        "test_batch_size": 16,
        "shuffle_test_dataloader": False,
        "num_workers": 8,
        "save_plot_every_n_epochs": 20,
        "save_every": 100,
        "eval_every": None,
    },
    "model": {"model_class": None},
    "data": {
        "modalities": {},  # filled per config
        "dataset_name": "ibl",
        "train_name": "train",
        "test_name": "test",
        "LOG_EPSILON": 1.0e-7,
        "use_lograte": True,
        "max_time_length": 100,
        "max_space_length": 668,
        "include_behav": False,
        "target": "whisker-motion-energy",
        "load_meta": True,
        "num_sessions": 1,
        "split_method": "session_based",
    },
    "method": {
        "model_kwargs": {
            "method_name": "ssl",
            "use_lograte": True,
            "loss": "poisson_nll",
        },
        "dataset_kwargs": {},
        "dataloader_kwargs": {},
    },
    "optimizer": {
        "gradient_accumulation_steps": 1,
        "lr": 5.0e-5,
        "wd": 0.01,
        "eps": 1.0e-8,
        "warmup_pct": 0.15,
        "gamma": 0.95,
        "div_factor": 10,
        "scheduler": "cosine",
    },
}

# train-config name -> list of input modalities
TRAIN_CONFIGS = {
    "linear_me": ["whisker-motion-energy"],
    "linear_video": ["video"],
    "linear_whisker-video": ["whisker-video"],
    "linear_whisker-of": ["whisker-of"],
    "linear_whisker-of-2d": ["whisker-of-2d"],
    "linear_whisker-of-video": ["whisker-of-video"],
    "linear_whole-of-video": ["whole-of-video"],
    "linear_me-video": ["whisker-motion-energy", "video"],
    "linear_of-ws": ["whisker-of", "wheel-speed"],
    "linear_of": ["whisker-of"],
    "linear_marker": ["marker"],
    "vmae_video": ["video"],
    "rrr": ["whisker-motion-energy"],
}

# keep loaded modalities minimal per config: inputs + ap + trial covariates
BASE_LOADED = ["ap", "choice", "block", "wheel-speed",
               "whisker-motion-energy", "timestamp"]

MLP_HIDDEN = {"encoder": [256, 128], "decoder": [128, 256]}

# model-config name -> (input comment, modalities)
MODEL_CONFIGS = {
    "linear_me": "whisker motion energy (120,)",
    "linear_video": "whole-face video 120x128x128",
    "linear_whisker-video": "whisker crop video",
    "linear_whisker-of": "whisker optical-flow summary (120, 3)",
    "linear_whisker-of-2d": "whisker optical-flow 2d median (120, 2)",
    "linear_whisker-of-video": "dense whisker flow video",
    "linear_whole-of-video": "dense whole-face flow video",
    "linear_me-video": "motion energy + whole-face video",
    "linear_of-ws": "whisker flow + wheel speed",
    "linear_marker": "DLC marker trajectories",
}


def modality_block(inputs):
    block = {}
    for mod in sorted(set(BASE_LOADED + inputs)):
        entry = {"transform": None, "transform_kwargs": {},
                 "input": mod in inputs}
        if mod in ("video", "whisker-video"):
            entry.update(width=128, height=128)
        block[mod] = entry
    return block


def main():
    (CFG / "train").mkdir(parents=True, exist_ok=True)
    (CFG / "model").mkdir(parents=True, exist_ok=True)
    (CFG / "model" / "vit_mae").mkdir(parents=True, exist_ok=True)
    (CFG / "model" / "videomae").mkdir(parents=True, exist_ok=True)

    for name, inputs in TRAIN_CONFIGS.items():
        cfg = copy.deepcopy(TRAIN_BASE)
        cfg["data"]["modalities"] = modality_block(inputs)
        if name == "vmae_video":
            cfg["training"]["train_batch_size"] = 8
            cfg["training"]["test_batch_size"] = 8
        (CFG / "train" / f"{name}.yaml").write_text(
            yaml.safe_dump(cfg, sort_keys=False))

    for name, comment in MODEL_CONFIGS.items():
        model = {
            "model_class": "Linear",
            "encoder": {
                "type": "LinearEncoder",
                "input_dim": None,  # overridden from loader metadata
                "hidden_dims": MLP_HIDDEN["encoder"],
                "output_dim": 64,
                "layer_num": len(MLP_HIDDEN["encoder"]),
            },
            "decoder": {
                "type": "LinearDecoder",
                "input_dim": 64,
                "hidden_dims": MLP_HIDDEN["decoder"],
                "output_dim": None,  # overridden: T_bins * n_neurons
                "layer_num": len(MLP_HIDDEN["decoder"]),
            },
        }
        (CFG / "model" / f"{name}.yaml").write_text(
            f"# input: {comment}\n" + yaml.safe_dump(model, sort_keys=False))

    vit_mae = {
        "model_class": "ViT_MAE",
        "hidden_size": 768,
        "num_hidden_layers": 12,
        "num_attention_heads": 12,
        "intermediate_size": 3072,
        "hidden_act": "gelu",
        "hidden_dropout_prob": 0.0,
        "attention_probs_dropout_prob": 0.0,
        "initializer_range": 0.02,
        "layer_norm_eps": 1.0e-12,
        "image_size": 144,
        "patch_size": 16,
        "num_channels": 1,
        "qkv_bias": True,
        "decoder_num_attention_heads": 16,
        "decoder_hidden_size": 512,
        "decoder_num_hidden_layers": 8,
        "decoder_intermediate_size": 2048,
        "mask_ratio": 0.75,
        "norm_pix_loss": False,
        "embed_size": 3,
    }
    (CFG / "model" / "vit_mae" / "vit_mae.yaml").write_text(
        yaml.safe_dump(vit_mae, sort_keys=False))

    # TPU-recommended SSL shape (round-3 head-width sweep, BASELINE.md "SSL
    # head-width sweep"): same ViT-Base capacity/FLOPs/params, fewer+wider
    # attention heads (256-wide vs the reference's 64-wide encoder / 32-wide
    # decoder heads, which under-fill the 128x128 MXU) — 132.9 -> 84.8
    # ms/step (1.57x pretrain throughput), quality-gated at the 5000-step
    # protocol. The reference-shaped vit_mae.yaml stays the parity default.
    vit_mae_turbo = dict(vit_mae, num_attention_heads=3,
                         decoder_num_attention_heads=2)
    (CFG / "model" / "vit_mae" / "vit_mae_turbo.yaml").write_text(
        "# TPU-recommended: reference capacity, MXU-matched 256-wide heads\n"
        + yaml.safe_dump(vit_mae_turbo, sort_keys=False))

    vtt_train = copy.deepcopy(TRAIN_BASE)
    vtt_train["data"]["modalities"] = modality_block(["video"])
    # B=16 is the measured throughput sweet spot for the flagship step
    # (22.5k fps at B=8 -> 29.6k at B=16 -> 28.5k at B=32; BASELINE.md
    # batch-scaling sweep). lr follows the linear-scaling rule (the
    # reference's own lr x world_size convention, src/pretrain.py:122):
    # at the base 5e-5 the halved step count cost 0.04 test bps on the
    # 5-session run; at 1e-4 quality matches B=8 exactly (0.492 vs 0.490)
    vtt_train["training"]["train_batch_size"] = 16
    vtt_train["training"]["test_batch_size"] = 16
    vtt_train["optimizer"]["lr"] = 1e-4
    vtt_train["model"] = {"model_class": "VideoTransformer"}
    (CFG / "train" / "vtt_video.yaml").write_text(
        yaml.safe_dump(vtt_train, sort_keys=False))
    vtt_model = {
        "model_class": "VideoTransformer",
        "t_frames": 120, "t_bins": 100,
        # round-3 shape sweep (BASELINE.md "VTT shape sweep"): wide-shallow
        # with 256-wide attention heads Pareto-dominates the round-2
        # 256/4-deep/64-wide-head shape — test bps 0.4943 -> 0.5009 at
        # 34.4 -> 24.6 ms/step (12.7 -> 34.5% MFU). Head width was the
        # single biggest lever: 64-wide heads under-fill the 128x128 MXU
        # in every attention matmul.
        "patch_size": 16, "hidden_size": 512,
        "frame_depth": 2, "temporal_depth": 2,
        "num_attention_heads": 2, "intermediate_size": 1024,
        # encode every 2nd frame: 60 Hz face video is temporally
        # redundant, the frame encoder is ~95% of the step, and on the
        # 5-session fixture stride 2 matches stride 1's quality exactly
        # (test bps 0.494 vs 0.492) at 1.9x the throughput (BASELINE.md
        # "frame-stride"); the reference's VideoMAE probe subsamples far
        # harder (16 of 120 frames)
        "frame_stride": 2,
        "n_sessions": None, "max_neurons": None,  # injected from data
    }
    (CFG / "model" / "vtt_video.yaml").write_text(
        yaml.safe_dump(vtt_model, sort_keys=False))

    videomae = {
        "model_class": "VideoMAE",
        "image_size": 224,
        "patch_size": 16,
        "num_channels": 3,
        "num_frames": 16,
        "tubelet_size": 2,
        "hidden_size": 768,
        "num_hidden_layers": 12,
        "num_attention_heads": 12,
        "intermediate_size": 3072,
        # checkpoint to fill the frozen backbone: orbax dir written by
        # cli/pretrain_videomae, or an HF torch state_dict / .npz
        "pretrained_backbone": None,
        "freeze_backbone": True,
        # hf_compat hosts released HF weights (interleaved sinusoid table,
        # no final encoder layernorm); set false for framework-pretrained
        # backbones
        "hf_compat": True,
        "encoder": {"output_dim": 256},
        "decoder": {"output_dim": None},  # overridden: T_bins * n_neurons
    }
    (CFG / "model" / "videomae" / "videomae.yaml").write_text(
        yaml.safe_dump(videomae, sort_keys=False))
    (CFG / "model" / "vmae_video.yaml").write_text(
        yaml.safe_dump(videomae, sort_keys=False))

    print(f"wrote configs under {CFG}")


if __name__ == "__main__":
    main()

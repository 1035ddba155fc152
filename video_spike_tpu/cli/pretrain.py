"""SSL pretraining of MAE / ContrastViT / ContrastViTMAE on whisker frames.

CLI parity with ``/root/reference/src/pretrain.py:39-210``:

    python -m video_spike_tpu.cli.pretrain --model cm \
        --model_config configs/model/vit_mae/vit_mae.yaml \
        --train_config configs/train/vmae_video.yaml --eid <eid> \
        [--h5_path data/data_rrr_whisker-video.h5] [--max_steps 40000]

Flow: contrast loaders (pretrain batch-512 triplets; per-trial train/val
loaders), model from the registry via the short-name map (c/cm/m), AdamW,
step-based fit with nested-RRR validation, then embed train+test with the
best checkpoint and save ``data/data_rrr_<model>_<eid5>.npy``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from video_spike_tpu.core.cli import get_args
from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.core.logging import logging as make_logger
from video_spike_tpu.core.registry import NAME2MODEL
from video_spike_tpu.core.rng import set_seed
from video_spike_tpu.data.contrast import make_contrast_loader
from video_spike_tpu.train.contrast import make_contrast_trainer

MODEL_SHORTNAMES = {"c": "ContrastViT", "cm": "ContrastViTMAE", "m": "MAE"}


def main(argv=None, h5_path: str | None = None):
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    log = make_logger(header="[pretrain]")
    log.info("Pretraining!")
    args, extra = _parse(argv)
    config = config_from_kwargs({"model": f"include:{args.model_config}"})
    config = update_config(args.train_config, config)
    # argparse values merge LAST, as in the reference (src/train.py:28-30),
    # so --seed actually takes effect over the yaml
    config["seed"] = args.seed
    set_seed(config.seed)

    h5_path = h5_path or extra.h5_path
    image_size = config.model.get("image_size", 144)
    batch_size = (args.batch_size
                  or config.training.get("train_batch_size", 128))
    max_steps = args.max_steps or 40000

    common = dict(eid=args.eid, idx_offset=3, image_size=image_size,
                  seed=config.seed)
    pretrain_dl, _ = make_contrast_loader(h5_path, mode="pretrain",
                                          batch_size=batch_size,
                                          shuffle=True, **common)
    val_dl, _ = make_contrast_loader(h5_path, mode="val", batch_size=1,
                                     shuffle=False, **common)
    train_dl, _ = make_contrast_loader(h5_path, mode="train", batch_size=1,
                                       shuffle=False, **common)

    model_name = MODEL_SHORTNAMES.get(args.model, args.model)
    model = NAME2MODEL[model_name].from_config(config.model)
    log.info(f"Model: {model_name}, Max steps: {max_steps}, "
             f"Batch: {batch_size}, EID: {args.eid}")

    trainer = make_contrast_trainer(
        model=model,
        data_loader=pretrain_dl,
        optimizer_config=dict(config.optimizer),
        val_data_loader=val_dl,
        train_data_loader=train_dl,
        max_steps=max_steps,
        eid=args.eid,
        log_dir=args.log_dir,
        image_size=image_size,
        seed=config.seed,
        log=log,
        validate_every=extra.validate_every,
        # HBM frame-cache cap (GB); datasets over it stream per-batch
        frame_cache_gb=float(config.training.get("frame_cache_gb", 2.0)),
        # mid-run durability: periodic last_model saves (async single-host)
        # + immediate best_model flush when validation finds a new best
        save_every_steps=config.training.get("save_every_steps", None),
        save_every_min=config.training.get("save_every_min", 10.0),
        flush_best=bool(config.training.get("flush_best", True)),
    )
    if args.resume:
        trainer.resume()
    trainer.fit()

    test_dl, _ = make_contrast_loader(h5_path, mode="test", batch_size=1,
                                      shuffle=False, **common)
    train_emb, train_neural = trainer.transform(train_dl, return_neural=True,
                                                use_best=True)
    test_emb, test_neural = trainer.transform(test_dl, return_neural=True,
                                              use_best=True)
    train_n, test_n = train_neural.shape[0], test_neural.shape[0]
    e_dim = train_emb.shape[-1]
    train_emb = train_emb.reshape(train_n, -1, e_dim)
    test_emb = test_emb.reshape(test_n, -1, e_dim)
    log.info(f"Embeddings: train {train_emb.shape}, test {test_emb.shape}")

    out = {args.eid: {"X": [train_emb, test_emb],
                      "y": [train_neural, test_neural],
                      "setup": {}}}
    path = f"data/data_rrr_{args.model}_{args.eid[:5]}.npy"
    # the transform above is collective (every rank embeds over the global
    # mesh), but the artifact write is rank-0-only — concurrent writers
    # to one .npy corrupt it (reference gating: src/pretrain.py:170-208)
    import jax
    if jax.process_index() == 0:
        os.makedirs("data", exist_ok=True)
        np.save(path, out)
        log.info(f"saved {path}")
    return path


def _parse(argv):
    # extend the shared surface with the h5 feature-cache path
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--h5_path", type=str,
                        default="data/data_rrr_whisker-video.h5")
    parser.add_argument("--validate_every", type=int, default=None,
                        help="validation cadence in steps (default: every "
                             "pass over the pretrain loader)")
    extra, rest = parser.parse_known_args(argv)
    return get_args(rest), extra


if __name__ == "__main__":
    main()

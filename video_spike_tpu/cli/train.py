"""Supervised end-to-end training entry point.

CLI parity with ``/root/reference/src/train.py:24-107`` (the ``train.sh``
path):

    python -m video_spike_tpu.cli.train \
        --model_config configs/model/linear_me.yaml \
        --train_config configs/train/linear_me.yaml \
        --eid <eid> [--data_dir ...] [--num_epochs N]

Flow: config merge -> seed -> 80/10/10 trial split -> loaders -> metadata
probe -> model from registry -> AdamW + OneCycle -> Poisson NLL -> trainer.
"""

from __future__ import annotations

from video_spike_tpu.core.cli import get_args
from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.core.logging import logging as make_logger
from video_spike_tpu.core.registry import NAME2MODEL
from video_spike_tpu.core.rng import set_seed
from video_spike_tpu.data.dataset import (
    get_metadata_from_loader,
    make_loader,
    split_dataset,
)
from video_spike_tpu.train.base import make_base_trainer


def main(argv=None):
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    log = make_logger(header="[train]")
    args = get_args(argv)
    kwargs = {"model": f"include:{args.model_config}"}
    config = config_from_kwargs(kwargs)
    config = update_config(args.train_config, config)
    # argparse values merge LAST, as in the reference (src/train.py:28-30),
    # so --seed actually takes effect over the yaml
    config["seed"] = args.seed
    if args.data_dir:
        config["dirs"]["data_dir"] = args.data_dir
    if args.num_epochs is not None:
        config["training"]["num_epochs"] = args.num_epochs
    if args.batch_size is not None:
        config["training"]["train_batch_size"] = args.batch_size
    config["save_plot"] = bool(args.save_plot)

    set_seed(config.seed)

    # multi-session flagship path: --eid all (data/eid.txt) or comma list
    if args.eid == "all" or "," in args.eid:
        return _train_multisession(args, config, log)

    split = split_dataset(config.dirs.data_dir, eid=args.eid,
                          seed=config.seed)
    if not split["train"]:
        raise SystemExit(
            f"no trial tars for eid {args.eid} in {config.dirs.data_dir}")
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    log.info(f"meta_data: {meta}")

    config["model"]["encoder"]["input_dim"] = meta["input_dim"]
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model_ctor = NAME2MODEL[config.model.model_class]
    model = model_ctor.from_config(config.model)

    trainer = make_base_trainer(
        model=model,
        train_loader=train_dl,
        eval_loader=val_dl,
        test_loader=test_dl,
        config=config,
        eid=args.eid,
        dataset_split_dict=split,
        log_dir=args.log_dir,
    )
    if args.resume:
        trainer.resume()
    return trainer.train()


def _train_multisession(args, config, log):
    from pathlib import Path

    from video_spike_tpu.train.multisession import MultiSessionTrainer

    if args.eid == "all":
        eids = [l.strip() for l in Path("data/eid.txt").read_text()
                .splitlines() if l.strip()]
    else:
        eids = [e for e in args.eid.split(",") if e]
    log.info(f"multi-session training over {len(eids)} sessions")

    trainer = MultiSessionTrainer(
        model=None, config=config, eids=eids,
        data_dir=config.dirs.data_dir, log_dir=args.log_dir,
        seed=config.seed)
    # size the model from the probed sessions, then build it
    model_cfg = dict(config.model)
    model_cfg["n_sessions"] = len(eids)
    model_cfg["max_neurons"] = trainer.max_neurons
    model_ctor = NAME2MODEL[config.model.get("model_class",
                                             "VideoTransformer")]
    trainer.model = model_ctor.from_config(model_cfg)
    if args.resume:
        trainer.resume()
    return trainer.train()


if __name__ == "__main__":
    main()

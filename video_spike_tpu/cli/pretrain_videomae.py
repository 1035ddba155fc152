"""Masked-video pretraining of the VideoMAE backbone on trial videos.

The reference has no equivalent entry point — it downloads released MCG-NJU
weights for the probe (``/root/reference/src/model/videomae.py:8``). In a
zero-egress deployment the probe's frozen backbone has to come from
somewhere, so this CLI pretrains ``VideoMAEForPreTraining`` on the session's
own whisker/face videos and writes an orbax checkpoint the probe loads via
``model.pretrained_backbone`` (set ``model.hf_compat: false`` in that case):

    python -m video_spike_tpu.cli.pretrain_videomae \
        --model_config configs/model/vmae_video.yaml \
        --train_config configs/train/vmae_video.yaml \
        --eid <eid> --data_dir ... [--max_steps N] [--mask_ratio 0.9]

The step is one jitted donated update; frames go through the same
``preprocess_frames`` device transform the probe applies, so the pretrained
encoder sees the probe's exact input distribution.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from video_spike_tpu.core.cli import get_args
from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.core.logging import logging as make_logger
from video_spike_tpu.core.rng import set_seed
from video_spike_tpu.data.dataset import make_loader, split_dataset
from video_spike_tpu.models.videomae import (
    VideoMAEForPreTraining,
    preprocess_frames,
)
from video_spike_tpu.train.checkpoint import save_checkpoint


def main(argv=None):
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    log = make_logger(header="[vmae-pretrain]")
    args, extra = _parse(argv)
    config = config_from_kwargs({"model": f"include:{args.model_config}"})
    config = update_config(args.train_config, config)
    # argparse values merge LAST, as in the reference (src/train.py:28-30),
    # so --seed actually takes effect over the yaml
    config["seed"] = args.seed
    if args.data_dir:
        config["dirs"]["data_dir"] = args.data_dir
    set_seed(config.seed)

    split = split_dataset(config.dirs.data_dir, eid=args.eid,
                          seed=config.seed)
    if not split["train"]:
        raise SystemExit(f"no trial tars for eid {args.eid} "
                         f"in {config.dirs.data_dir}")
    if args.batch_size is not None:
        config["training"]["train_batch_size"] = args.batch_size
    train_dl, _, _ = make_loader(config, split)

    mcfg = dict(config.model)
    model = VideoMAEForPreTraining.from_config(
        {k: v for k, v in mcfg.items() if k not in ("encoder", "decoder")})
    num_frames = mcfg.get("num_frames", 16)
    image_size = mcfg.get("image_size", 224)
    mask_ratio = extra.mask_ratio
    max_steps = args.max_steps or 2000
    video_key = extra.video_mod

    tx = optax.adamw(config.optimizer.get("lr", 1e-4),
                     weight_decay=config.optimizer.get("wd", 0.01))
    params = opt_state = step_fn = None
    key = jax.random.PRNGKey(config.seed)

    def make_step():
        def train_step(params, opt_state, video, rng):
            def loss_fn(p):
                x = preprocess_frames(video, num_frames, image_size,
                                      source_frames=video.shape[1])
                out = model.apply(p, x, mask_ratio=mask_ratio,
                                  rngs={"masking": rng})
                return out["recon_loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(train_step, donate_argnums=(0, 1))

    step = 0
    losses = []
    sub_idx = None
    while step < max_steps:
        for batch in train_dl:
            raw = np.asarray(batch[video_key])
            if sub_idx is None:
                # uniform 16-of-120 subsample ON HOST (same indices
                # preprocess_frames would pick on device): the tunnel link
                # is ~1.2 GB/s, so shipping only the surviving frames cuts
                # per-step H2D 7.5x at the recipe shape
                sub_idx = (np.linspace(0, 1, num_frames)
                           * (raw.shape[1] - 1)).astype(int)
            video = jnp.asarray(np.ascontiguousarray(raw[:, sub_idx]))
            if params is None:
                x = preprocess_frames(video[:1], num_frames, image_size,
                                      source_frames=video.shape[1])
                params = model.init({"params": key, "masking": key}, x)
                opt_state = tx.init(params)
                step_fn = make_step()
                n = sum(int(np.prod(p.shape))
                        for p in jax.tree.leaves(params))
                log.info(f"VideoMAEForPreTraining: {n/1e6:.1f}M params, "
                         f"mask_ratio={mask_ratio}, max_steps={max_steps}")
            key, sub = jax.random.split(key)
            params, opt_state, loss = step_fn(params, opt_state, video, sub)
            losses.append(loss)  # device scalar; converted at log cadence
            if step % 50 == 0:
                log.info({"step": step, "recon_loss": float(loss)})
            step += 1
            if step >= max_steps:
                break

    out_dir = os.path.join(args.log_dir, args.eid[:5], "VideoMAEPretrain")
    os.makedirs(out_dir, exist_ok=True)
    save_checkpoint(out_dir, "backbone", {"params": jax.device_get(params)})
    final = float(np.mean([float(l) for l in losses[-20:]]))
    log.info(f"saved backbone checkpoint to {out_dir}/backbone "
             f"(final recon_loss {final:.4f}); point "
             f"model.pretrained_backbone at it with model.hf_compat: false")
    return os.path.join(out_dir, "backbone")


def _parse(argv):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--mask_ratio", type=float, default=0.9)
    parser.add_argument("--video_mod", type=str, default="video",
                        help="which video modality to pretrain on "
                             "(video | whisker-video)")
    extra, rest = parser.parse_known_args(argv)
    return get_args(rest), extra


if __name__ == "__main__":
    main()

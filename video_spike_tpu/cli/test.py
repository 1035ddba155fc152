"""Multi-session SSL evaluation: embed with the best checkpoint, fit RRR on
the embeddings, report per-eid and mean bps.

CLI parity with ``/root/reference/src/test.py:43-246``: loops the eids in
``data/eid.txt`` (or just ``--eid``), loads each session's ``best_model``
checkpoint (skipping ``fit()``), embeds train/test, fits RRR on the
embeddings, prints per-eid and mean bps, and optionally saves embedding
visualizations (``--save_plot``).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from video_spike_tpu.core.cli import get_args
from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.core.logging import logging as make_logger
from video_spike_tpu.core.registry import NAME2MODEL
from video_spike_tpu.core.rng import set_seed
from video_spike_tpu.data.contrast import make_contrast_loader
from video_spike_tpu.cli.pretrain import MODEL_SHORTNAMES
from video_spike_tpu.train.contrast import make_contrast_trainer
from video_spike_tpu.train.rrr_pipeline import train_rrr


def main(argv=None):
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    log = make_logger(header="[test]")
    log.info("Testing!")
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--h5_path", type=str,
                        default="data/data_rrr_whisker-video.h5")
    # the reference writes its --save_plot artifacts into the CWD
    # (src/test.py:187-236); an explicit dir keeps that default but makes
    # the surface scriptable
    parser.add_argument("--plot_dir", type=str, default=".")
    extra, rest = parser.parse_known_args(argv)
    args = get_args(rest)
    config = config_from_kwargs({"model": f"include:{args.model_config}"})
    config = update_config(args.train_config, config)
    # argparse values merge LAST, as in the reference (src/train.py:28-30),
    # so --seed actually takes effect over the yaml
    config["seed"] = args.seed
    set_seed(config.seed)

    eid_file = Path("data/eid.txt")
    eids = ([l.strip() for l in eid_file.read_text().splitlines() if l.strip()]
            if eid_file.exists() else [args.eid])

    image_size = config.model.get("image_size", 144)
    model_name = MODEL_SHORTNAMES.get(args.model, args.model)

    test_bps = []
    for eid in eids:
        common = dict(eid=eid, idx_offset=3, image_size=image_size,
                      seed=config.seed)
        train_dl, _ = make_contrast_loader(extra.h5_path, mode="train",
                                           batch_size=1, shuffle=False,
                                           **common)
        test_dl, _ = make_contrast_loader(extra.h5_path, mode="test",
                                          batch_size=1, shuffle=False,
                                          **common)
        model = NAME2MODEL[model_name].from_config(config.model)
        trainer = make_contrast_trainer(
            model=model, data_loader=train_dl,
            optimizer_config=dict(config.optimizer),
            max_steps=40000, eid=eid, log_dir=args.log_dir,
            image_size=image_size, seed=config.seed, log=log)

        train_emb, train_y = trainer.transform(train_dl, return_neural=True,
                                               use_best=True)
        test_emb, test_y = trainer.transform(test_dl, return_neural=True,
                                             use_best=True)
        e_dim = train_emb.shape[-1]
        train_emb = train_emb.reshape(train_y.shape[0], -1, e_dim)
        test_emb = test_emb.reshape(test_y.shape[0], -1, e_dim)
        # subsample the 120 frame-steps down to the 100 spike bins — only
        # for the RRR copy; the plots below use the FULL trajectories, as in
        # the reference (src/test.py:189-203 plots train/test_embedding and
        # only `train_data` gets the `[:, sorted_idx]` subsample)
        t_frames, t_bins = train_emb.shape[1], train_y.shape[1]
        if t_frames > t_bins:
            idx = np.sort(np.random.choice(t_frames - 1, t_bins,
                                           replace=False))
            train_emb_rrr = train_emb[:, idx]
            test_emb_rrr = test_emb[:, idx]
        else:
            train_emb_rrr, test_emb_rrr = train_emb, test_emb

        data_dict = {eid: {"X": [train_emb_rrr, test_emb_rrr],
                           "y": [train_y, test_y], "setup": {}}}
        result = train_rrr(data_dict)
        bps = float(np.nanmean(result[eid]["bps"]))
        log.info(f"eid {eid[:5]}: bps={bps:.5f}")
        test_bps.append(bps)

        if args.save_plot:
            # the full reference --save_plot surface (src/test.py:186-239):
            # a train-embedding PNG, a first-test-trial embedding PNG, then
            # per-trial raw-video GIFs + animated embedding-trajectory GIFs
            # for the first 5 test trials (the reference breaks at idx > 3
            # AFTER processing idx 4). Intentional deviation: the reference
            # writes the train-embedding PNG even without --save_plot; we
            # gate every artifact behind the flag.
            import matplotlib.pyplot as plt

            from video_spike_tpu.viz.embeddings import (
                plot_embeddings, plot_embeddings_anim,
                save_numpy_video_to_gif)

            out_dir = Path(extra.plot_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            fig = plot_embeddings(train_emb.reshape(-1, e_dim))
            fig.savefig(out_dir / f"{args.model}_{eid[:5]}_embed.png")
            plt.close(fig)
            fig = plot_embeddings(
                test_emb[0], title=f"{args.model}_{eid[:5]}_embed_test")
            fig.savefig(out_dir / f"test_embed_{args.model}_{eid[:5]}.png")
            plt.close(fig)
            for idx, batch in enumerate(test_dl):
                video = np.asarray(batch["ref"])
                if video.ndim == 5:   # (1, T, C, H, W) batch of one trial
                    video = video[0]
                save_numpy_video_to_gif(
                    video,
                    str(out_dir / f"test_{args.model}_{eid[:5]}_{idx}.gif"),
                    fps=10)
                plot_embeddings_anim(
                    test_emb[idx],
                    str(out_dir /
                        f"test_embed_{args.model}_{eid[:5]}_{idx}.gif"),
                    fps=10)
                if idx > 3:
                    break

    log.info(f"per-eid bps: {[round(b, 5) for b in test_bps]}")
    log.info(f"mean bps: {np.mean(test_bps):.5f}")
    return test_bps


if __name__ == "__main__":
    main()

"""Embed whisker video with the CEBRA-style embedder (or PCA) and cache the
per-session RRR feature file.

CLI parity with ``/root/reference/src/use_cebra.py``: extracts train/test
whisker-video via the loaders, embeds frames (train+test jointly), and saves
``data/data_rrr_<cebra|pca>_<eid5>.npy``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from video_spike_tpu.core.cli import get_args
from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.core.rng import set_seed
from video_spike_tpu.data.dataset import make_loader, split_dataset
from video_spike_tpu.data.rrr_data import get_rrr_data
from video_spike_tpu.models.cebra import get_cebra_embedding, get_pca_embedding


def main(argv=None):
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--use_pca", action="store_true")
    parser.add_argument("--out_dim", type=int, default=5)
    parser.add_argument("--max_iterations", type=int, default=5000)
    extra, rest = parser.parse_known_args(argv)
    args = get_args(rest)

    config = config_from_kwargs({"model": f"include:{args.model_config}"})
    config = update_config(args.train_config, config)
    # argparse values merge LAST, as in the reference (src/train.py:28-30),
    # so --seed actually takes effect over the yaml
    config["seed"] = args.seed
    if args.data_dir:
        config["dirs"]["data_dir"] = args.data_dir
    if "whisker-video" not in config.data.modalities:
        config["data"]["modalities"]["whisker-video"] = {
            "transform": None, "input": False}
    set_seed(config.seed)

    label = "pca" if extra.use_pca else "cebra"
    eid = args.eid
    split = split_dataset(config.dirs.data_dir, eid=eid, seed=config.seed)
    train_dl, _val_dl, test_dl = make_loader(config, split)

    train_X, train_y, _ = get_rrr_data(train_dl, "whisker-video")
    test_X, test_y, _ = get_rrr_data(test_dl, "whisker-video")
    all_X = np.concatenate([train_X, test_X], axis=0)
    n_train = train_X.shape[0]

    save_path = f"{label}_{eid[:5]}"
    if extra.use_pca:
        emb = get_pca_embedding(all_X, out_dim=extra.out_dim)
    else:
        emb = get_cebra_embedding(all_X, out_dim=extra.out_dim,
                                  save_path=save_path,
                                  max_iterations=extra.max_iterations)

    train_data = {eid: {"X": [emb[:n_train], emb[n_train:]],
                        "y": [train_y, test_y], "setup": {}}}
    os.makedirs("data", exist_ok=True)
    out = f"data/data_rrr_{label}_{eid[:5]}.npy"
    np.save(out, train_data)
    print(f"saved {out}")
    return out


if __name__ == "__main__":
    main()

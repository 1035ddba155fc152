"""Extract per-session (X, y, timestamp) feature arrays for the RRR path.

CLI parity with ``/root/reference/src/create_eid_data.py:31-123``: for each
eid in ``data/eid.txt`` (or ``--eid``), build loaders, extract features for
``--input_mod``, and save ``data/data_rrr_<mod>.npy`` (or an h5 for
``whisker-video``). Split order in the artifact is [train, test, val].
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from video_spike_tpu.core.cli import get_args
from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.core.rng import set_seed
from video_spike_tpu.data.dataset import make_loader, split_dataset
from video_spike_tpu.data.rrr_data import SHORTNAME_TO_MOD, get_rrr_data


def read_eids(args) -> list:
    eid_file = Path("data/eid.txt")
    if eid_file.exists():
        return [l.strip() for l in eid_file.read_text().splitlines() if l.strip()]
    return [args.eid]


def main(argv=None):
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    args = get_args(argv)
    config = config_from_kwargs({"model": f"include:{args.model_config}"})
    config = update_config(args.train_config, config)
    # argparse values merge LAST, as in the reference (src/train.py:28-30),
    # so --seed actually takes effect over the yaml
    config["seed"] = args.seed
    if args.data_dir:
        config["dirs"]["data_dir"] = args.data_dir
    set_seed(config.seed)

    input_mod = SHORTNAME_TO_MOD.get(args.input_mod, args.input_mod)
    # make sure the loaders decode the modalities this extraction reads
    needed = {"ap", "timestamp", "choice", "block", "wheel-speed",
              "whisker-motion-energy"}
    if input_mod in ("whisker-of-video", "of-all"):
        needed.add("whisker-of-video")
    if input_mod not in ("all", "other", "of-all"):
        needed.add(input_mod)
    for mod in needed:
        if mod not in config.data.modalities:
            config["data"]["modalities"][mod] = {
                "transform": None, "input": False}
    eids = read_eids(args)

    train_data = {eid: {"X": [], "y": [], "timestamp": [], "setup": {}}
                  for eid in eids}
    for eid in eids:
        split = split_dataset(config.dirs.data_dir, eid=eid, seed=config.seed)
        train_dl, val_dl, test_dl = make_loader(config, split)
        # artifact split order: [train, test, val] (reference parity)
        for dl in (train_dl, test_dl, val_dl):
            X, y, ts = get_rrr_data(dl, input_mod)
            train_data[eid]["X"].append(X)
            train_data[eid]["y"].append(y)
            train_data[eid]["timestamp"].append(ts)

    os.makedirs("data", exist_ok=True)
    if args.input_mod == "whisker-video":
        import h5py
        out = "data/data_rrr_whisker-video.h5"
        with h5py.File(out, "w") as f:
            for eid, data in train_data.items():
                grp = f.create_group(str(eid))
                for i, split_name in enumerate(("train", "test", "val")):
                    grp.create_dataset(f"X_{split_name}", data=data["X"][i],
                                       compression="gzip")
                    grp.create_dataset(f"y_{split_name}", data=data["y"][i],
                                       compression="gzip")
                    grp.create_dataset(f"timestamp_{split_name}",
                                       data=data["timestamp"][i],
                                       compression="gzip")
    else:
        out = f"data/data_rrr_{args.input_mod}.npy"
        np.save(out, train_data)
    print(f"saved {out}")
    return out


if __name__ == "__main__":
    main()

"""Determinism: same seed -> identical splits, batches, params, and losses.

The reference's only determinism story is global seeds + cudnn flags
(``/root/reference/src/utils/utils.py:49-59``); here the guarantee is
testable end-to-end because randomness is explicit (PRNG keys + seeded
host RNGs).
"""

import numpy as np
import pytest

import jax

from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.data.synthetic import make_synthetic_session


@pytest.fixture(scope="module")
def session_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("determ")
    make_synthetic_session(d, eid="deter0000", n_trials=14, n_neurons=4,
                           seed=23, height=32, width=32)
    return d


def _run(session_dir, log_dir):
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.core.rng import set_seed
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer

    set_seed(42)
    config = config_from_kwargs(
        {"model": "include:configs/model/linear_me.yaml"})
    config = update_config("configs/train/linear_me.yaml", config)
    config["dirs"]["data_dir"] = str(session_dir)
    config["training"]["num_epochs"] = 2
    config["training"]["train_batch_size"] = 8
    split = split_dataset(str(session_dir), "deter0000", seed=42)
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["encoder"]["input_dim"] = meta["input_dim"]
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL[config.model.model_class].from_config(config.model)
    t = BaseTrainer(model, train_dl, val_dl, test_dl, config,
                    eid="deter0000", dataset_split_dict=split,
                    log_dir=str(log_dir), seed=42)
    losses = [t.train_epoch()["train_loss"] for _ in range(2)]
    leaves = [np.asarray(l) for l in jax.tree.leaves(t.params)]
    return split["train"], losses, leaves


def test_same_seed_same_everything(session_dir, tmp_path):
    files1, losses1, leaves1 = _run(session_dir, tmp_path / "r1")
    files2, losses2, leaves2 = _run(session_dir, tmp_path / "r2")
    assert files1 == files2                       # identical split
    assert losses1 == losses2                     # identical training curve
    for a, b in zip(leaves1, leaves2):            # identical final params
        np.testing.assert_array_equal(a, b)


def test_different_seed_different_split(session_dir):
    from video_spike_tpu.data.dataset import split_dataset
    a = split_dataset(str(session_dir), "deter0000", seed=1)
    b = split_dataset(str(session_dir), "deter0000", seed=2)
    assert a["train"] != b["train"]

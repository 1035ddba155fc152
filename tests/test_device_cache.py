"""Device-resident dataset cache: staging, reshuffled epochs, equivalence."""

import numpy as np
import pytest

from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.data.synthetic import make_synthetic_session


@pytest.fixture(scope="module")
def session_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("devcache")
    make_synthetic_session(d, eid="cache0000", n_trials=18, n_neurons=5,
                           seed=17, height=32, width=32)
    return d


def _trainer(session_dir, log_dir, device_cache: bool, num_epochs=4):
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer

    config = config_from_kwargs(
        {"model": "include:configs/model/linear_of-ws.yaml"})
    config = update_config("configs/train/linear_of-ws.yaml", config)
    config["dirs"]["data_dir"] = str(session_dir)
    config["training"]["num_epochs"] = num_epochs
    config["training"]["train_batch_size"] = 8
    config["training"]["device_cache"] = device_cache
    config["optimizer"]["lr"] = 1e-3
    split = split_dataset(str(session_dir), "cache0000", seed=0)
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["encoder"]["input_dim"] = meta["input_dim"]
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL[config.model.model_class].from_config(config.model)
    return BaseTrainer(model, train_dl, val_dl, test_dl, config,
                       eid="cache0000", dataset_split_dict=split,
                       log_dir=str(log_dir))


def test_cached_epochs_learn(session_dir, tmp_path):
    t = _trainer(session_dir, tmp_path / "a", device_cache=True)
    first = t.train_epoch()
    assert t._dev_data is not None  # staging happened
    for _ in range(6):
        last = t.train_epoch()
    assert last["train_loss"] < first["train_loss"] - 0.02
    # eval still works through the streaming path
    ev = t.eval_epoch()
    assert np.isfinite(ev["eval_res"]["eval_bps"])


def test_cached_vs_streaming_same_magnitude(session_dir, tmp_path):
    """Both paths train to similar losses (not identical: different batch
    permutations), and the cached path handles the remainder batch."""
    tc = _trainer(session_dir, tmp_path / "c", device_cache=True)
    ts = _trainer(session_dir, tmp_path / "s", device_cache=False)
    for _ in range(5):
        lc = tc.train_epoch()["train_loss"]
        ls = ts.train_epoch()["train_loss"]
    assert abs(lc - ls) < 0.1, (lc, ls)
    assert ts._dev_data is None


def test_cache_cap_falls_back(session_dir, tmp_path):
    t = _trainer(session_dir, tmp_path / "cap", device_cache=True)
    t._device_cache_gb = 1e-6  # force over-cap
    t.train_epoch()
    assert t._dev_data is None
    assert not t._device_cache_enabled

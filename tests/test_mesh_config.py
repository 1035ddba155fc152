"""training.mesh config knob wires into the trainers' mesh construction."""

import numpy as np
import pytest

from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.data.synthetic import make_synthetic_session


@pytest.fixture(scope="module")
def session_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("meshcfg")
    make_synthetic_session(d, eid="meshc0000", n_trials=10, n_neurons=4,
                           seed=29, height=32, width=32)
    return d


def test_trainer_mesh_from_config(session_dir, tmp_path):
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer

    config = config_from_kwargs(
        {"model": "include:configs/model/linear_me.yaml"})
    config = update_config("configs/train/linear_me.yaml", config)
    config["dirs"]["data_dir"] = str(session_dir)
    config["training"]["num_epochs"] = 1
    config["training"]["train_batch_size"] = 8
    config["training"]["mesh"] = {"data": 4, "model": 2}
    split = split_dataset(str(session_dir), "meshc0000", seed=0)
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["encoder"]["input_dim"] = meta["input_dim"]
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL["Linear"].from_config(config.model)
    t = BaseTrainer(model, train_dl, val_dl, test_dl, config,
                    eid="meshc0000", dataset_split_dict=split,
                    log_dir=str(tmp_path))
    assert dict(t.mesh.shape) == {"data": 4, "model": 2}
    res = t.train_epoch()   # one epoch runs under the 4x2 mesh
    assert np.isfinite(res["train_loss"])

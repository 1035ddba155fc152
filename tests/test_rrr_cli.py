"""create_eid_data -> train_rrr CLI path on a synthetic session."""

import os

import numpy as np
import pytest

from video_spike_tpu.data.rrr_data import get_rrr_data
from video_spike_tpu.data.synthetic import make_synthetic_session


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rrr_cli")
    make_synthetic_session(d, eid="feedc0000", n_trials=30, n_neurons=10,
                           seed=5, height=32, width=32)
    return d


def _loaders(fixture_dir):
    from video_spike_tpu.core.config import DictConfig
    from video_spike_tpu.data.dataset import make_loader, split_dataset
    config = DictConfig({
        "seed": 0,
        "training": {"train_batch_size": 8, "test_batch_size": 8},
        "data": {"modalities": {
            "ap": {"input": False},
            "whisker-motion-energy": {"input": True},
            "wheel-speed": {"input": False},
            "choice": {"input": False},
            "block": {"input": False},
            "whisker-of-video": {"input": False},
        }},
    })
    split = split_dataset(str(fixture_dir), "feedc0000", seed=0)
    return make_loader(config, split)


def test_get_rrr_data_modalities(fixture_dir):
    train_dl, _, _ = _loaders(fixture_dir)
    X, y, ts = get_rrr_data(train_dl, "whisker-motion-energy")
    assert X.shape == (24, 120) and y.shape == (24, 100, 10)
    assert ts.shape == (24, 120)
    X_all, _, _ = get_rrr_data(train_dl, "all")
    assert X_all.shape == (24, 120, 4)
    X_of, _, _ = get_rrr_data(train_dl, "of-all")
    assert X_of.shape == (24, 120, 5)
    X_ofv, _, _ = get_rrr_data(train_dl, "whisker-of-video")
    assert X_ofv.shape == (24, 120, 2)


def test_create_and_train_rrr_cli(fixture_dir, tmp_path, monkeypatch):
    from video_spike_tpu.cli.create_eid_data import main as create_main
    from video_spike_tpu.cli.train_rrr import main as rrr_main

    monkeypatch.chdir(tmp_path)
    os.makedirs("data", exist_ok=True)
    with open("data/eid.txt", "w") as f:
        f.write("feedc0000\n")

    out = create_main([
        "--model_config", str(_repo("configs/model/linear_me.yaml")),
        "--train_config", str(_repo("configs/train/rrr.yaml")),
        "--input_mod", "all",
        "--data_dir", str(fixture_dir),
    ])
    assert os.path.exists(out)
    saved = np.load(out, allow_pickle=True).item()
    assert saved["feedc0000"]["X"][0].shape[2] == 4  # me, ws, choice, block

    result = rrr_main([
        "--model_config", str(_repo("configs/model/linear_me.yaml")),
        "--train_config", str(_repo("configs/train/rrr.yaml")),
        "--input_mod", "all",
    ])
    assert os.path.exists("all_result.npy")
    res = result["feedc0000"]
    # smoothed low-rate fixture: co-bps should be finite and clearly > -1
    assert np.isfinite(np.nanmean(res["co_bps"]))
    assert np.nanmean(res["co_bps"]) > -1.0

    # the reference-parity optimizer stays reachable from the CLI
    lb = rrr_main([
        "--solver", "lbfgs",
        "--model_config", str(_repo("configs/model/linear_me.yaml")),
        "--train_config", str(_repo("configs/train/rrr.yaml")),
        "--input_mod", "all",
    ])["feedc0000"]
    assert np.isfinite(np.nanmean(lb["co_bps"]))
    # same objective, same data: the two solvers land close together
    assert abs(np.nanmean(lb["co_bps"]) - np.nanmean(res["co_bps"])) < 0.2
    assert res["pred"].min() >= 1e-3


def _repo(rel):
    from pathlib import Path
    return Path(__file__).resolve().parent.parent / rel

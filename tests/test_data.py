"""Tar IO, synthetic fixture, split, loader, and prefetch tests."""

import numpy as np
import pytest

from video_spike_tpu.data.dataset import (
    SessionDataset,
    get_metadata_from_loader,
    make_loader,
    split_dataset,
)
from video_spike_tpu.data.prefetch import background
from video_spike_tpu.data.synthetic import make_synthetic_session
from video_spike_tpu.data.tar_io import read_trial_tar, write_trial_tar


@pytest.fixture(scope="module")
def session_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixture")
    make_synthetic_session(d, eid="aaaa0000", n_trials=12, n_neurons=8, seed=1)
    make_synthetic_session(d, eid="bbbb1111", n_trials=6, n_neurons=8, seed=2)
    return d


def test_tar_roundtrip(tmp_path, rng):
    arrays = {"ap": rng.poisson(1.0, (100, 5)).astype(np.float32),
              "timestamp": np.arange(120, dtype=np.float64)}
    video = rng.integers(0, 255, (120, 32, 32)).astype(np.uint8)
    write_trial_tar(tmp_path / "e_0.tar", "e_0", arrays,
                    videos={"video": video}, meta={"trial": 0})
    out = read_trial_tar(tmp_path / "e_0.tar")
    assert out["__key__"] == "e_0"
    assert out["eid"] == "e"
    np.testing.assert_array_equal(out["ap"], arrays["ap"])
    assert out["video"].shape == (120, 1, 32, 32)
    np.testing.assert_array_equal(out["video"][:, 0], video.astype(np.float32))
    assert out["meta"]["trial"] == 0


def test_tar_mp4_roundtrip(tmp_path, rng):
    video = rng.integers(0, 255, (12, 64, 64)).astype(np.uint8)
    write_trial_tar(tmp_path / "e_1.tar", "e_1", {},
                    videos={"video": video}, store_video_as="mp4")
    out = read_trial_tar(tmp_path / "e_1.tar")
    assert out["video"].shape == (12, 1, 64, 64)
    # lossy codec: close, not exact (cast first: uint8 subtraction wraps)
    err = np.abs(out["video"][:, 0].astype(np.int16)
                 - video.astype(np.int16)).mean()
    assert err < 8.0, f"mp4 roundtrip too lossy: {err}"


def test_split_dataset(session_dir):
    split = split_dataset(session_dir, "aaaa0000", seed=0)
    assert len(split["train"]) == 9   # 0.8 * 12 = 9.6 -> 9
    assert len(split["val"]) == 1
    assert len(split["test"]) == 2
    assert split["eid"]["train"] == ["aaaa0000"]
    # no leakage between splits
    assert not set(split["train"]) & set(split["test"])
    # filtering excludes the other session
    all_files = split["train"] + split["val"] + split["test"]
    assert all("bbbb" not in f for f in all_files)


def test_split_deterministic(session_dir):
    a = split_dataset(session_dir, "aaaa0000", seed=7)
    b = split_dataset(session_dir, "aaaa0000", seed=7)
    assert a["train"] == b["train"]


def test_session_dataset_batching(session_dir):
    split = split_dataset(session_dir, "aaaa0000", seed=0)
    ds = SessionDataset(split["train"], batch_size=4, shuffle=True, seed=0)
    batches = list(ds)
    assert len(batches) == 3  # 9 trials -> 4,4,1
    assert batches[0]["ap"].shape == (4, 100, 8)
    assert batches[0]["video"].shape == (4, 120, 1, 128, 128)
    assert batches[-1]["ap"].shape[0] == 1
    assert all(e == "aaaa0000" for e in batches[0]["eid"])
    # epoch order changes with shuffle
    keys1 = [b["__key__"] for b in ds]
    keys2 = [b["__key__"] for b in ds]
    assert keys1 != keys2


def test_make_loader_and_metadata(session_dir):
    from video_spike_tpu.core.config import DictConfig
    config = DictConfig({
        "seed": 0,
        "training": {"train_batch_size": 4, "test_batch_size": 2},
        "data": {"modalities": {
            "ap": {"input": False},
            "whisker-motion-energy": {"input": True},
            "wheel-speed": {"input": True},
        }},
    })
    split = split_dataset(session_dir, "aaaa0000", seed=0)
    train, val, test = make_loader(config, split)
    meta = get_metadata_from_loader(train, config)
    assert meta["num_neurons"] == 8
    assert meta["input_dim"] == 240  # two (120,) modalities
    assert meta["output_dim"] == 800
    assert meta["input_mods"] == ["whisker-motion-energy", "wheel-speed"]


def test_background_iterator_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = background(gen(), depth=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_background_iterator_order():
    assert list(background(iter(range(20)), depth=3)) == list(range(20))

"""Final coverage batch: time-offset contrastive sampling, RRR no-bias
branch, embedding animation, empty-result CLI paths."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_contrast_dataset_time_offset():
    from video_spike_tpu.data.contrast import ContrastDataset

    n, t = 4, 30
    video = np.zeros((n, t, 1, 8, 8), np.uint8)
    ts = np.arange(n * t, dtype=np.float64).reshape(n, t) * 0.5  # 2 Hz
    data = {"train_X": video, "val_X": video[:1], "test_X": video[:1],
            "train_timestamp": ts, "val_timestamp": ts[:1],
            "test_timestamp": ts[:1]}
    ds = ContrastDataset(data, mode="pretrain", time_offset=1.0, seed=0)
    idx = np.arange(20, 40)
    pos = ds._pos_idx(idx)
    # positives must be within 1.0 s == 2 samples at 0.5 s spacing
    assert np.all(np.abs(ds.timestamp[pos] - ds.timestamp[idx]) <= 1.0)


def test_rrr_compute_beta_without_bias(rng):
    from video_spike_tpu.models.rrr import RRRGD, compute_beta

    X = rng.normal(size=(6, 5, 3))
    y = rng.normal(size=(6, 5, 4))
    data = {"e": {"X": [X, X], "y": [y, y], "setup": {}}}
    model = RRRGD(data, ncomp=2)
    with_b = np.asarray(compute_beta(model.params, "e", withbias=True))
    no_b = np.asarray(compute_beta(model.params, "e", withbias=False))
    assert with_b.shape == no_b.shape == (4, 3, 5)
    np.testing.assert_array_equal(no_b[:, -1], 0.0)      # bias column zeroed
    np.testing.assert_allclose(with_b[:, :-1], no_b[:, :-1])


def test_plot_embeddings_anim(tmp_path, rng):
    from video_spike_tpu.viz.embeddings import plot_embeddings_anim

    emb = rng.normal(size=(60, 3))
    path = plot_embeddings_anim(emb, str(tmp_path / "a.gif"), fps=10)
    assert (tmp_path / "a.gif").stat().st_size > 0
    # 2-D embeddings also render
    plot_embeddings_anim(rng.normal(size=(40, 2)), str(tmp_path / "b.gif"))
    assert (tmp_path / "b.gif").exists()


def test_visualize_result_empty_dir(tmp_path, monkeypatch):
    from video_spike_tpu.cli.visualize_result import main

    monkeypatch.chdir(tmp_path)
    (tmp_path / "empty").mkdir()
    assert main(["--log_dir", str(tmp_path / "empty")]) is None


def test_split_dataset_no_matching_eid(tmp_path):
    from video_spike_tpu.data.dataset import split_dataset

    split = split_dataset(tmp_path, "missing000")
    assert split["train"] == [] and split["test"] == []


def test_contrast_loader_len(tmp_path, rng):
    """make_contrast_loader's view object reports batch count correctly."""
    import h5py
    from video_spike_tpu.data.contrast import make_contrast_loader

    path = tmp_path / "d.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("eidx")
        for split, n in (("train", 4), ("test", 2), ("val", 2)):
            g.create_dataset(f"X_{split}",
                             data=rng.integers(0, 255, (n, 10, 1, 8, 8))
                             .astype(np.uint8))
            g.create_dataset(f"y_{split}",
                             data=rng.normal(size=(n, 10, 3)))
            g.create_dataset(f"timestamp_{split}",
                             data=np.arange(n * 10).reshape(n, 10) / 60.0)
    loader, _ = make_contrast_loader(str(path), mode="pretrain", eid="eidx",
                                     batch_size=16)
    assert len(loader) == (8 * 10 + 15) // 16
    batches = list(loader)
    assert sum(b["ref"].shape[0] for b in batches) == 80

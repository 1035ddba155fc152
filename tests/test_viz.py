"""Plotting artifacts: figures render and files get written."""

import numpy as np
import pytest

from video_spike_tpu.viz.embeddings import (
    float32_to_uint8,
    plot_embeddings,
    save_numpy_video_to_gif,
)
from video_spike_tpu.viz.plots import plot_gt_pred, plot_neurons_r2
from video_spike_tpu.viz.raster import neuronwise_r2, raster_grid, scatter_compare


@pytest.fixture
def result_pair(rng):
    K, T, N = 12, 20, 6
    gt = rng.poisson(1.0, (K, T, N)).astype(float)
    mk = lambda: {
        "gt": gt,
        "pred": np.clip(gt + 0.3 * rng.normal(size=gt.shape), 1e-3, None),
        "co_bps": rng.normal(size=N).tolist(),
    }
    return mk(), mk()


def test_scatter_compare(result_pair, tmp_path):
    fig = scatter_compare(*result_pair, "me", "of", eid="abcde0000")
    fig.savefig(tmp_path / "s.png")
    assert (tmp_path / "s.png").stat().st_size > 0


def test_raster_grid(result_pair, tmp_path, rng):
    ref, mod = result_pair
    choice = rng.choice([-1.0, 1.0], size=12)
    block = rng.choice([0.2, 0.5, 0.8], size=12)
    fig = raster_grid(np.asarray(ref["gt"]),
                      {"me": np.asarray(ref["pred"]),
                       "of": np.asarray(mod["pred"])},
                      choice=choice, block=block, n_neurons=3)
    fig.savefig(tmp_path / "r.png")
    assert (tmp_path / "r.png").stat().st_size > 0


def test_neuronwise_r2_perfect(rng):
    gt = rng.normal(size=(5, 10, 3))
    np.testing.assert_allclose(neuronwise_r2(gt, gt), 1.0)


def test_gt_pred_and_neurons(tmp_path, rng):
    gt = rng.poisson(1.0, (20, 5)).astype(float)
    pred = np.clip(gt + 0.1, 0.01, None)
    plot_gt_pred(gt.T, pred.T).savefig(tmp_path / "a.png")
    plot_neurons_r2(gt, pred, neuron_idx=range(2)).savefig(tmp_path / "b.png")
    assert (tmp_path / "a.png").exists() and (tmp_path / "b.png").exists()


def test_video_gif(tmp_path, rng):
    video = rng.normal(size=(8, 1, 16, 16)).astype(np.float32)
    path = save_numpy_video_to_gif(video, str(tmp_path / "v.gif"), fps=5)
    assert (tmp_path / "v.gif").stat().st_size > 0
    u8 = float32_to_uint8(video)
    assert u8.dtype == np.uint8 and u8.max() == 255


def test_plot_embeddings(tmp_path, rng):
    fig = plot_embeddings(rng.normal(size=(100, 3)))
    fig.savefig(tmp_path / "e.png")
    assert (tmp_path / "e.png").exists()

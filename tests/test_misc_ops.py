"""Coverage for remaining op/utility surfaces: extra metrics, prefetch-to-
device, tracker, topk."""

import json

import numpy as np
import pytest

import jax

from video_spike_tpu.core.tracking import Tracker
from video_spike_tpu.data.prefetch import prefetch_to_device
from video_spike_tpu.ops.metrics import metrics_list, topk


def test_metrics_list_extra_metrics(rng):
    K, T, N = 6, 8, 3
    gt = rng.poisson(1.0, (K, T, N)).astype(float)
    pred = np.clip(gt + 0.1 * rng.normal(size=gt.shape), 0.01, None)
    gi, pi = np.swapaxes(gt, 0, -1), np.swapaxes(pred, 0, -1)
    res = metrics_list(gi, pi, metrics=("mse", "mae", "behave_r2", "r2"))
    assert np.isclose(res["mse"], np.mean((gi - pi) ** 2))
    assert np.isclose(res["mae"], np.mean(np.abs(gi - pi)))
    assert -1.0 <= res["behave_r2"] <= 1.0
    assert np.isfinite(res["r2"])
    acc = metrics_list(gi, gi, metrics=("acc",))["acc"]
    assert acc == 1.0


def test_topk():
    sim = np.array([[0.9, 0.1, 0.0],
                    [0.2, 0.8, 0.0],
                    [0.7, 0.2, 0.1]])
    labels = np.array([0, 1, 2])
    assert np.isclose(topk(sim, labels, k=1), 2 / 3)  # rows 0,1 correct
    assert np.isclose(topk(sim, labels, k=3), 1.0)    # everything within top-3


def test_prefetch_to_device():
    batches = [{"x": np.full((4, 3), i, np.float32), "eid": ["e"] * 4}
               for i in range(6)]
    out = list(prefetch_to_device(iter(batches), depth=2))
    assert len(out) == 6
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_allclose(np.asarray(b["x"]), i)
        assert b["eid"] == ["e"] * 4  # strings stay on host


def test_prefetch_transform_runs_on_host():
    batches = [{"x": np.ones((3, 2), np.float32)} for _ in range(3)]

    def pad(b):
        return {"x": np.pad(b["x"], ((0, 1), (0, 0)))}

    out = list(prefetch_to_device(iter(batches), transform=pad))
    assert all(b["x"].shape == (4, 2) for b in out)


def test_tracker_jsonl(tmp_path):
    tr = Tracker(str(tmp_path), use_wandb=False)
    tr.log({"loss": 1.5, "note": "hi"}, step=3)
    tr.log({"loss": np.float32(0.5)}, step=4)
    tr.close()
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 3
    assert lines[0]["note"] == "hi"
    assert lines[1]["loss"] == 0.5
    # wandb requested but unavailable -> still logs to JSONL
    tr2 = Tracker(str(tmp_path / "w"), use_wandb=True)
    tr2.log({"a": 1})
    tr2.close()
    assert (tmp_path / "w" / "metrics.jsonl").exists()

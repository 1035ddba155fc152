"""Wandb-arm contract for the Tracker (fake-module test).

wandb is not installed in this image, so the tracker's wandb branch would
otherwise never execute. These tests inject a recording stub ``wandb`` into
``sys.modules`` and assert the calls match the reference's usage:

- ``wandb.init(project=..., name=..., config=...)`` gated on the use flag
  (``/root/reference/src/trainer/base.py:56-58``,
  ``src/trainer/contrast.py:232-237``);
- ``wandb.log(metrics, step=...)`` mirroring every scalar log
  (``src/trainer/base.py:126-127``, ``src/trainer/contrast.py:46-55``);
- figures logged as ``wandb.Image`` (``src/trainer/base.py:122-125`` via
  ``_plot_figs``);
- ``finish()`` on close, and rank-0-only gating in multihost runs
  (reference: ``accelerator.is_main_process`` guard,
  ``src/trainer/contrast.py:232``).
"""

import json
import os
import sys
import types

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pytest

from video_spike_tpu.core.tracking import Tracker


class _Recorder:
    """Stub wandb module: records every call."""

    def __init__(self):
        self.calls = []

    def make_module(self):
        mod = types.ModuleType("wandb")
        rec = self

        def init(**kwargs):
            rec.calls.append(("init", kwargs))

        def log(metrics, step=None):
            rec.calls.append(("log", metrics, step))

        def finish():
            rec.calls.append(("finish",))

        class Image:
            def __init__(self, fig):
                rec.calls.append(("Image", type(fig).__name__))
                self.fig = fig

        mod.init = init
        mod.log = log
        mod.finish = finish
        mod.Image = Image
        return mod


@pytest.fixture
def fake_wandb(monkeypatch):
    rec = _Recorder()
    monkeypatch.setitem(sys.modules, "wandb", rec.make_module())
    return rec


def test_wandb_arm_init_log_figure_finish(fake_wandb, tmp_path):
    tr = Tracker(str(tmp_path), project="video-ssl", name="ssl_run",
                 use_wandb=True, config={"lr": 1e-3})
    tr.log({"train_loss": 0.5, "cur_step": 10}, step=10)

    fig = plt.figure()
    fig.gca().plot([0, 1], [1, 0])
    tr.log_figure("best_gt_pred", fig, step=10)
    plt.close(fig)
    tr.close()

    kinds = [c[0] for c in fake_wandb.calls]
    assert kinds == ["init", "log", "Image", "log", "finish"], kinds

    _, init_kwargs = fake_wandb.calls[0]
    assert init_kwargs["project"] == "video-ssl"
    assert init_kwargs["name"] == "ssl_run"
    assert init_kwargs["config"] == {"lr": 1e-3}

    _, metrics, step = fake_wandb.calls[1]
    assert metrics == {"train_loss": 0.5, "cur_step": 10} and step == 10

    _, fig_metrics, fig_step = fake_wandb.calls[3]
    assert list(fig_metrics) == ["best_gt_pred"] and fig_step == 10
    assert fake_wandb.calls[2] == ("Image", "Figure")

    # the JSONL mirror records the same events regardless of wandb
    lines = [json.loads(ln) for ln in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["train_loss"] == 0.5 and lines[0]["step"] == 10
    assert lines[1]["figure"] == "best_gt_pred"
    assert os.path.exists(lines[1]["path"])


def test_wandb_arm_disabled_never_touches_wandb(fake_wandb, tmp_path):
    """use_wandb=False must not init/log even with wandb importable (the
    reference's ``if self.config.wandb.use`` / ``if self.use_wandb``)."""
    tr = Tracker(str(tmp_path), use_wandb=False)
    tr.log({"loss": 1.0}, step=0)
    tr.close()
    assert fake_wandb.calls == []


def test_wandb_arm_rank0_gating(fake_wandb, tmp_path, monkeypatch):
    """Non-main multihost ranks must not init wandb and must divert their
    JSONL (reference: main-process guard, contrast.py:232)."""
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    tr = Tracker(str(tmp_path), use_wandb=True)
    tr.log({"loss": 1.0}, step=0)
    tr.log_figure("fig", None, step=0)   # must early-return, not savefig
    tr.close()
    assert fake_wandb.calls == []
    assert not os.path.exists(tmp_path / "metrics.jsonl")

    # ...and the main rank still does
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    tr = Tracker(str(tmp_path), use_wandb=True)
    tr.log({"loss": 1.0}, step=0)
    tr.close()
    assert [c[0] for c in fake_wandb.calls] == ["init", "log", "finish"]

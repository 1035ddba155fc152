"""Graceful preemption: SIGTERM mid-training -> model_last checkpoint +
clean exit; --resume continues from the saved epoch (subprocess, CPU)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from video_spike_tpu.data.synthetic import make_synthetic_session

RUNNER = """
import jax; jax.config.update("jax_platforms", "cpu")
import sys
from video_spike_tpu.cli.train import main
res = main(sys.argv[1:])
print("RESULT", res)
"""


def _spawn(args, env):
    return subprocess.Popen(
        [sys.executable, "-c", RUNNER, *args], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


@pytest.mark.timeout(600)
@pytest.mark.slow
def test_sigterm_checkpoints_and_resume(tmp_path):
    data = tmp_path / "data"
    make_synthetic_session(data, eid="abcde0000", n_trials=16, n_neurons=6,
                           seed=3, height=32, width=32)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.getcwd(), env.get("PYTHONPATH", "")])
    args = ["--model_config", "configs/model/linear_of-ws.yaml",
            "--train_config", "configs/train/linear_of-ws.yaml",
            "--eid", "abcde0000", "--data_dir", str(data),
            "--num_epochs", "500", "--batch_size", "8",
            "--log_dir", str(tmp_path / "logs")]

    proc = _spawn(args, env)
    # wait until a few epochs have logged, then send the cluster's TERM
    lines = []
    deadline = time.time() + 240
    epochs_seen = 0
    while time.time() < deadline and epochs_seen < 3:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if "'epoch':" in line:
            epochs_seen += 1
    assert epochs_seen >= 3, "".join(lines)[-2000:]
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    lines.append(out)
    text = "".join(lines)
    assert proc.returncode == 0, text[-2000:]
    assert "preempted" in text, text[-2000:]

    log_dir = tmp_path / "logs" / "abcde" / "wheel-speed_whisker-of" / \
        "LinearModel"
    assert (log_dir / "model_last").exists()

    # resume: must start from a later epoch, not epoch 0 (epoch budget well
    # above wherever the TERM landed, so at least one epoch always runs)
    proc = _spawn(args + ["--resume", "--num_epochs", "40"], env)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-2000:]
    assert "resumed from epoch" in out, out[-2000:]
    # the resumed run's first logged epoch is > 0
    first_epoch = int(out.split("'epoch': ")[1].split(",")[0])
    assert first_epoch > 0, out[-2000:]

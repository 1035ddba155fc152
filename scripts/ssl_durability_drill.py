"""SSL durability drill: kill -9 at production scale + resume from the
periodic checkpoint (VERDICT r4 item 8).

Round 5 gave the ContrastTrainer mid-run durability (periodic async
``last_model`` flushes + immediate ``best_model`` flush on a new validation
best, ``train/contrast.py``). The subprocess tests prove the mechanism at toy
scale on CPU (`tests/test_preempt.py`); this drill exercises the seam that
actually matters — an UNGRACEFUL death (SIGKILL: no signal handler, no grace
window, the failure mode the round-4 40k run was exposed to) during a
production-shape run on the real chip — and measures what the periodic saves
cost at the 111M-param turbo recipe shape.

Protocol (mirrors the recipe of BASELINE.md "Measured turbo 40k recipe"):

1. build a recipe-scale learnable fixture (60 trials of 120x(106x160)
   whisker frames + latent-driven Poisson spikes, the same construction as
   ``data/synthetic.py`` rendered into the contrast h5 layout);
2. segment A: ``cli.pretrain --model cm`` (ContrastViTMAE turbo, batch 128
   triplets, HBM frame cache) with ``training.save_every_steps=500``; poll
   the tracker JSONL and ``kill -9`` the trainer at ~step 1200 — after the
   step-1000 periodic flush and the step-1008 validation, mid-epoch,
   between periodic saves;
3. assert the surviving ``last_model`` + paired sampler sidecar are the
   step-1000 periodic flush (the round-4 code would have left NOTHING);
4. segment B: relaunch with ``--resume`` (budget the axon pool-grant wait:
   after kill -9 the chip claim takes tens of minutes to free — CLAUDE.md),
   assert it restores step 1000 with a mid-epoch sampler fast-forward, and
   run to completion (2000 steps + transform + embedding artifacts);
5. report steady 50-step window times split into windows WITH vs WITHOUT a
   periodic save, i.e. the measured per-save cost off the hot loop.

    python scripts/ssl_durability_drill.py [--workdir /tmp/ssl_drill]
    python scripts/ssl_durability_drill.py --tiny   # CPU harness smoke

Reference behavior being beaten: the reference SSL trainer persists best on
validation but has no periodic/step checkpoint and no resume at all
(/root/reference/src/trainer/contrast.py:53-67); any mid-run death loses the
run's tail and all optimizer state.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EID = "drill5e000"
MODEL_NAME = "ContrastViTMAE"

TINY_VIT = dict(
    model_class="ViT_MAE", image_size=32, patch_size=8, num_channels=1,
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, decoder_hidden_size=32,
    decoder_num_hidden_layers=1, decoder_num_attention_heads=4,
    decoder_intermediate_size=64, mask_ratio=0.75, norm_pix_loss=False,
    embed_size=3)

CPU_RUNNER = """
import jax; jax.config.update("jax_platforms", "cpu")
import sys
from video_spike_tpu.cli.pretrain import main
main(sys.argv[1:])
print("PRETRAIN_DONE")
"""


def make_fixture(h5_path: Path, tiny: bool) -> None:
    """Recipe-scale contrast h5: blob-latent frames at the whisker-crop
    resolution + latent-driven Poisson spikes (learnable, so the nested-RRR
    validation/best-flush path runs with real dynamics)."""
    import h5py

    from video_spike_tpu.data.synthetic import _render_frames, _smooth_latent

    rng = np.random.default_rng(7)
    h, w = (32, 32) if tiny else (106, 160)
    n_neurons = 8 if tiny else 64
    counts = ({"train": 6, "val": 2, "test": 2} if tiny
              else {"train": 48, "val": 6, "test": 6})
    w_lat = rng.normal(scale=1.0, size=(2, n_neurons))
    bias = rng.uniform(-2.2, -1.2, size=(n_neurons,))
    t0 = 0.0
    with h5py.File(h5_path, "w") as f:
        grp = f.create_group(EID)
        for split, n_tr in counts.items():
            X = np.empty((n_tr, 120, 1, h, w), np.uint8)
            y = np.empty((n_tr, 100, n_neurons), np.float32)
            ts = np.empty((n_tr, 120), np.float64)
            for k in range(n_tr):
                latent = _smooth_latent(rng, 120)
                X[k, :, 0] = _render_frames(latent, h, w, rng)
                idx = np.linspace(0, 119, 100).astype(int)
                y[k] = rng.poisson(
                    np.exp(latent[idx] @ w_lat + bias)).astype(np.float32)
                ts[k] = t0 + np.arange(120) / 60.0
                t0 += 3.0
            grp.create_dataset(f"X_{split}", data=X)
            grp.create_dataset(f"y_{split}", data=y)
            grp.create_dataset(f"timestamp_{split}", data=ts)


def write_configs(workdir: Path, tiny: bool, save_every: int) -> tuple:
    import yaml

    if tiny:
        model_cfg = workdir / "tiny_vit.yaml"
        with open(model_cfg, "w") as f:
            yaml.safe_dump(TINY_VIT, f)
    else:
        model_cfg = REPO / "configs/model/vit_mae/vit_mae_turbo.yaml"
    with open(REPO / "configs/train/vmae_video.yaml") as f:
        train = yaml.safe_load(f)
    train["training"]["save_every_steps"] = save_every
    # step cadence only: the 10-min wall default would add off-schedule
    # saves and muddy the per-save overhead measurement
    train["training"]["save_every_min"] = None
    train_cfg = workdir / "drill_train.yaml"
    with open(train_cfg, "w") as f:
        yaml.safe_dump(train, f)
    return model_cfg, train_cfg


def launch(workdir: Path, args: list, log_name: str, tiny: bool):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO), env.get("PYTHONPATH", "")])
    if tiny:
        env.pop("JAX_PLATFORMS", None)
        cmd = [sys.executable, "-c", CPU_RUNNER, *args]
    else:
        cmd = [sys.executable, "-m", "video_spike_tpu.cli.pretrain", *args]
    out = open(workdir / log_name, "ab", buffering=0)
    return subprocess.Popen(cmd, env=env, cwd=str(workdir),
                            stdout=out, stderr=subprocess.STDOUT)


def read_metrics(path: Path) -> list:
    if not path.exists():
        return []
    records = []
    with open(path) as f:
        for line in f:
            try:
                records.append(json.loads(line))
            except json.JSONDecodeError:
                pass  # mid-write tail
    return records


def wait_for_step(metrics: Path, target: int, timeout_s: float,
                  proc, poll_s: float = 2.0) -> int:
    """Poll the tracker JSONL until a train record reaches ``target``."""
    deadline = time.time() + timeout_s
    last = -1
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(
                f"trainer exited early (rc={proc.returncode}) at step {last}")
        for rec in read_metrics(metrics):
            if "loss" in rec and rec.get("step", -1) > last:
                last = rec["step"]
        if last >= target:
            return last
        time.sleep(poll_s)
    raise TimeoutError(f"step {target} not reached in {timeout_s}s "
                       f"(last seen {last})")


def window_stats(records: list, save_every: int, max_steps: int) -> dict:
    """50-step window times from tracker ``t`` deltas, split by whether the
    window contains a periodic-save step. ``t`` restarts per segment (each
    process owns its tracker clock), so windows are computed within
    monotone-t runs only; windows containing a validation record are
    excluded from both buckets (the nested-RRR fit is a separate cost,
    already recorded in BASELINE.md)."""
    plain, with_save, val_steps = [], [], set()
    train = [r for r in records if "loss" in r and "step" in r]
    for r in records:
        if "val_bps" in r and "step" in r:
            val_steps.add(r["step"])
    for a, b in zip(train, train[1:]):
        if b["t"] <= a["t"] or b["step"] - a["step"] != 50:
            continue  # segment boundary / restart
        lo, hi = a["step"], b["step"]
        if any(lo < v <= hi for v in val_steps):
            continue
        ms = (b["t"] - a["t"]) / 50 * 1e3
        saves = [s for s in range(save_every, max_steps + 1, save_every)
                 if lo < s <= hi]
        (with_save if saves else plain).append(ms)
    out = {"windows_no_save": len(plain),
           "windows_with_save": len(with_save)}
    if plain:
        out["ms_per_step_no_save_median"] = round(float(np.median(plain)), 2)
        out["ms_per_step_no_save_min"] = round(float(np.min(plain)), 2)
    if with_save:
        out["ms_per_step_with_save"] = [round(m, 2) for m in with_save]
        out["per_save_overhead_ms"] = round(
            (float(np.median(with_save)) - float(np.median(plain))) * 50
            if plain else float("nan"), 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/ssl_drill")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke of the harness logic (tiny ViT)")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--kill_step", type=int, default=None)
    ap.add_argument("--save_every", type=int, default=None)
    args = ap.parse_args()

    tiny = args.tiny
    max_steps = args.max_steps or (400 if tiny else 2000)
    kill_step = args.kill_step or (150 if tiny else 1200)
    save_every = args.save_every or (50 if tiny else 500)
    batch = 16 if tiny else 128
    validate_every = 100 if tiny else 1000
    poll_s = 0.5 if tiny else 2.0
    # segment-A budget: remote cold compile of the 111M donated program has
    # been observed at 6-13 min in this environment; B additionally waits
    # out the axon pool grant after the kill -9 (observed >= 25 min)
    budget_a = 300 if tiny else 2400
    budget_b = 300 if tiny else 4800

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    h5_path = workdir / "frames.h5"
    if not h5_path.exists():
        make_fixture(h5_path, tiny)
    model_cfg, train_cfg = write_configs(workdir, tiny, save_every)
    log_dir = workdir / "logs"
    run_dir = log_dir / EID / MODEL_NAME / str(max_steps)
    metrics = run_dir / "metrics.jsonl"
    if run_dir.exists():
        raise SystemExit(f"{run_dir} exists — the drill needs a fresh run "
                         f"dir (rm -rf {log_dir} or pick a new --workdir)")

    cli = ["--model", "cm", "--model_config", str(model_cfg),
           "--train_config", str(train_cfg), "--eid", EID,
           "--h5_path", str(h5_path), "--log_dir", str(log_dir),
           "--max_steps", str(max_steps), "--batch_size", str(batch),
           "--validate_every", str(validate_every)]

    report = {"shape": "tiny CPU smoke" if tiny else
              "ContrastViTMAE turbo 111M, batch 128, 60-trial 106x160 "
              "fixture, HBM frame cache",
              "save_every_steps": save_every, "max_steps": max_steps}

    # ---- segment A: run, then kill -9 between periodic saves ------------
    t0 = time.time()
    proc = launch(workdir, cli, "segment_a.log", tiny)
    try:
        wait_for_step(metrics, 0, budget_a, proc, poll_s)
        startup_a = round(time.time() - t0, 1)
        seen = wait_for_step(metrics, kill_step, budget_a, proc, poll_s)
    except Exception:
        proc.kill()
        raise
    os.kill(proc.pid, signal.SIGKILL)  # explicit PID, never by pattern
    proc.wait()
    report["segment_a"] = {
        "killed_at_step_logged": seen, "signal": "SIGKILL",
        "startup_to_first_step_s": startup_a,
        "wall_s": round(time.time() - t0, 1)}

    # ---- what survived? --------------------------------------------------
    # the surviving checkpoint must be a PERIODIC flush: its sidecar step is
    # a save_every multiple at/below the killed step (polling drift means the
    # exact step is data, not an input — the production run pins it at 1000)
    sidecar = run_dir / "last_model.sampler.json"
    surv = {"last_model_exists": (run_dir / "last_model").exists(),
            "sidecar_exists": sidecar.exists()}
    expected_ckpt = None
    if sidecar.exists():
        with open(sidecar) as f:
            surv["sidecar"] = json.load(f)
        expected_ckpt = surv["sidecar"].get("step")
        surv["sidecar_is_periodic_flush"] = (
            expected_ckpt is not None and expected_ckpt % save_every == 0
            and 0 < expected_ckpt < max_steps)
    report["survived"] = surv
    assert surv["last_model_exists"], "periodic flush left no checkpoint"
    assert surv.get("sidecar_is_periodic_flush"), surv

    # ---- segment B: --resume to completion -------------------------------
    t0 = time.time()
    n_before = len(read_metrics(metrics))
    proc = launch(workdir, cli + ["--resume"], "segment_b.log", tiny)
    rc = None
    startup_b = None  # launch -> first step logged: chip-claim wait (the
    # post-kill-9 pool grant) + restore + remote compile, indistinguishably
    deadline = time.time() + budget_b
    while time.time() < deadline:
        rc = proc.poll()
        if rc is not None:
            break
        if startup_b is None and len(read_metrics(metrics)) > n_before:
            startup_b = round(time.time() - t0, 1)
        time.sleep(5.0)
    if rc is None:
        proc.kill()
        raise TimeoutError(f"segment B exceeded {budget_b}s")
    seg_b_log = (workdir / "segment_b.log").read_text(errors="replace")
    # rich may wrap long lines in a piped console; normalize before grepping
    flat = " ".join(seg_b_log.split())
    recs = read_metrics(metrics)
    train_recs = [r for r in recs if "loss" in r and "step" in r]
    # segment B's records start at the t-clock reset (each process owns its
    # tracker t0); its first logged step shows where training restarted
    first_b = None
    for a, b in zip(train_recs, train_recs[1:]):
        if b["t"] <= a["t"]:
            first_b = b["step"]
    report["segment_b"] = {
        "returncode": rc, "wall_s": round(time.time() - t0, 1),
        "startup_to_first_step_s": startup_b,
        "restored_from_periodic": (
            f"resumed from step {expected_ckpt}" in flat),
        "mid_epoch_fast_forward": "sampler resumed mid-epoch" in flat,
        "first_logged_step_after_resume": first_b,
        "embeddings_artifact": (
            workdir / "data" / f"data_rrr_cm_{EID[:5]}.npy").exists()}
    assert rc == 0, f"segment B failed rc={rc}; see segment_b.log"

    # ---- periodic-save overhead from the tracker windows ------------------
    report["step_windows"] = window_stats(read_metrics(metrics), save_every,
                                          max_steps)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

"""Recipe-scale quality gate for the VTT ``pool_before_norm`` variant.

Round 5's MFU attempt (BASELINE.md "Round-5 MFU attempt") measured
``pool_before_norm`` — mean-pool the 64-token axis BEFORE the final f32
LayerNorm, S× less f32 LN traffic — at −1.7% step on top of the shipped
``matmul_patchify``. Unlike matmul_patchify it is NOT numerically
equivalent (pooling and LN don't commute), and the fused-readout
post-mortem (BASELINE.md) is this repo's standing rule: every numerics-
changing variant gets a full-recipe quality arm before it ships, because
small golden tests cannot see production-scale failures.

Protocol (same as the round-3 VTT shape sweep gate): 25-epoch end-to-end
``cli.train`` multi-session runs on a 5-session synthetic fixture
(128² video, neuron counts up to the 668 padding bound), identical
seed/recipe in both arms, compared on held-out test co-bps and R².
The round-3 absolute numbers (0.5009/0.3114) were measured on a fixture
that no longer exists; the gate is the WITHIN-fixture delta, so both arms
run fresh here.

    python scripts/quality_gate_pbn.py [--workdir /tmp/pbn_gate]
                                       [--epochs 25] [--arms base,pbn]

Ship rule: pbn becomes the model default only if test bps AND R² are
equal-or-better; otherwise the flag stays opt-in and the refusal is
recorded in BASELINE.md.

Round-5 outcome (BASELINE.md "Round-5 MFU attempt"): both arms trained to
chance-level bps on the fresh 30-trial-per-session fixture (−0.04761 vs
−0.04765) — equal, but non-probative at production signal levels, so pbn
stayed opt-in. Before re-running, strengthen the fixture until the base
arm reaches clearly-positive test bps (the lost round-3 fixture trained
to ~0.50); 30 trials/session × 25 epochs is demonstrably not enough
signal for this gate.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EIDS = ["qgatea0000", "qgateb0000", "qgatec0000", "qgated0000",
        "qgatee0000"]
NEURONS = [668, 436, 292, 521, 254]


def make_fixture(data_dir: Path) -> None:
    from video_spike_tpu.data.synthetic import make_synthetic_session
    for i, (eid, n) in enumerate(zip(EIDS, NEURONS)):
        make_synthetic_session(data_dir, eid=eid, n_trials=30, n_neurons=n,
                               seed=10 + i, store_video_as="npy")


def run_arm(workdir: Path, name: str, overrides: dict, epochs: int) -> dict:
    import yaml
    with open(REPO / "configs/model/vtt_video.yaml") as f:
        model_cfg = yaml.safe_load(f)
    model_cfg.update(overrides)
    cfg_path = workdir / f"model_{name}.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(model_cfg, f)

    log_dir = workdir / f"logs_{name}"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO), env.get("PYTHONPATH", "")])
    t0 = time.time()
    cmd = [sys.executable, "-m", "video_spike_tpu.cli.train",
           "--eid", ",".join(EIDS),
           "--model_config", str(cfg_path),
           "--train_config", str(REPO / "configs/train/vtt_video.yaml"),
           "--data_dir", str(workdir / "fixture"),
           "--num_epochs", str(epochs),
           "--log_dir", str(log_dir)]
    with open(workdir / f"{name}.log", "ab", buffering=0) as out:
        rc = subprocess.call(cmd, env=env, cwd=str(workdir),
                             stdout=out, stderr=subprocess.STDOUT)
    wall = time.time() - t0
    if rc != 0:
        raise RuntimeError(f"arm {name} failed rc={rc}; see {name}.log")
    # MultiSessionTrainer writes test_results.npy under its nested log dir
    hits = list(log_dir.rglob("test_results.npy"))
    assert hits, f"no test_results.npy under {log_dir}"
    res = np.load(hits[0], allow_pickle=True).item()["test_res"]
    return {"test_bps": float(np.nanmean(res["test_bps"])),
            "test_r2": float(np.nanmean(res["test_rsquared"])),
            "wall_s": round(wall, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/pbn_gate")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--arms", type=str, default="base,pbn")
    args = ap.parse_args()

    workdir = Path(args.workdir)
    (workdir / "fixture").mkdir(parents=True, exist_ok=True)
    if not list((workdir / "fixture").glob("*.tar")):
        make_fixture(workdir / "fixture")

    arms = {"base": {},  # shipped default: matmul_patchify on, pbn off
            "pbn": {"pool_before_norm": True}}
    report = {}
    for name in args.arms.split(","):
        report[name] = run_arm(workdir, name, arms[name], args.epochs)
        print(json.dumps({name: report[name]}), flush=True)
    if {"base", "pbn"} <= report.keys():
        report["ship"] = (
            report["pbn"]["test_bps"] >= report["base"]["test_bps"] - 1e-4
            and report["pbn"]["test_r2"] >= report["base"]["test_r2"] - 1e-4)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

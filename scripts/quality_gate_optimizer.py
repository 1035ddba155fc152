"""Optimizer quality gate: AdamW(bf16+SR) vs lean-Adafactor(bf16+SR) at
the full 200-epoch `train.sh` recipe (BASELINE.md "optimizer gate").

Runs both arms sequentially via the real CLI on a 120-trial 436-neuron
synthetic fixture and prints one JSON line per arm. Pass --seed to add
gate replicas (round-3 shipped on seed 42; see BASELINE.md for results).

    python scripts/quality_gate_optimizer.py [--seed 42] [--fixture DIR]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def write_arm_configs(tmp: Path) -> dict:
    import yaml
    cfg = yaml.safe_load((REPO / "configs/train/linear_video.yaml").read_text())
    cfg["optimizer"]["param_dtype"] = "bfloat16_sr"
    sr = tmp / "linear_video_sr.yaml"
    sr.write_text(yaml.safe_dump(cfg))
    cfg["optimizer"]["name"] = "adafactor"
    cfg["optimizer"]["param_scale"] = False
    cfg["optimizer"]["clipping"] = None
    af = tmp / "linear_video_af.yaml"
    af.write_text(yaml.safe_dump(cfg))
    cfg["optimizer"]["fused_readout"] = True
    fu = tmp / "linear_video_fused.yaml"
    fu.write_text(yaml.safe_dump(cfg))
    return {"adamw_sr": sr, "adafactor_lean_sr": af,
            "fused_readout_sr": fu}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--fixture", type=str, default=None)
    ap.add_argument("--arms", type=str, default=None,
                    help="comma-separated arm names (default: all)")
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="optgate_"))
    fixture = args.fixture
    if fixture is None:
        fixture = str(tmp / "fixture")
        subprocess.run(
            [sys.executable, "-m", "video_spike_tpu.cli.make_fixture",
             "--out", fixture, "--eid", "qualeid000", "--n_trials", "120",
             "--n_neurons", "436", "--height", "128", "--width", "128"],
            check=True, cwd=REPO)

    arms = set(args.arms.split(",")) if args.arms else None
    for name, cfg in write_arm_configs(tmp).items():
        if arms is not None and name not in arms:
            continue
        out = subprocess.run(
            [sys.executable, "-u", "-m", "video_spike_tpu.cli.train",
             "--model_config", "configs/model/linear_video.yaml",
             "--train_config", str(cfg), "--eid", "qualeid000",
             "--data_dir", fixture, "--seed", str(args.seed),
             "--log_dir", str(tmp / f"logs_{name}_s{args.seed}")],
            capture_output=True, text=True, cwd=REPO)
        text = out.stdout + out.stderr
        rec = {"arm": name, "seed": args.seed}
        m = re.search(r"best_eval_bps': (-?[0-9.e+-]+)", text)
        t = re.search(r"'test_bps': (-?[0-9.e+-]+)", text)
        w = re.search(r"trained 200 epochs in ([0-9.]+)s", text)
        rec["best_eval_bps"] = float(m.group(1)) if m else None
        rec["test_bps"] = float(t.group(1)) if t else None
        rec["wall_s"] = float(w.group(1)) if w else None
        if out.returncode != 0:
            rec["error"] = text[-300:]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

"""Optimizer quality gate: AdamW(bf16+SR) vs lean-Adafactor(bf16+SR) at
the full 200-epoch `train.sh` recipe (BASELINE.md "optimizer gate").

Runs both arms sequentially via the real CLI on a 120-trial 436-neuron
synthetic fixture and prints one JSON line per arm. Pass --seed to add
gate replicas (round-3 shipped on seed 42; see BASELINE.md for results).

    python scripts/quality_gate_optimizer.py [--seed 42] [--fixture DIR]

``--suite probe`` swaps in the VideoMAE-probe arms instead: the frozen
ViT-Base probe (`cli.train` + `configs/model/videomae/videomae.yaml`)
trained end-to-end with the lean-adafactor head update materialized vs
fused (`optimizer.fused_readout`, ops/fused_readout.py). Random-init
backbone, so lr is pinned to the documented safe 2e-6 (BASELINE.md
"VideoMAE probe profile": the reference recipe's 5e-5 diverges without
pretrained weights); both arms share it, the gate compares arms, not
recipes. Default 12 epochs — steady-state head epochs are sub-second, the
run is compile- and encode-dominated.
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


def write_probe_arm_configs(tmp: Path) -> dict:
    import yaml
    cfg = yaml.safe_load((REPO / "configs/train/vmae_video.yaml").read_text())
    cfg["optimizer"]["name"] = "adafactor"
    cfg["optimizer"]["param_scale"] = False
    cfg["optimizer"]["clipping"] = None
    cfg["optimizer"]["param_dtype"] = "bfloat16_sr"
    cfg["optimizer"]["lr"] = 2.0e-06
    mat = tmp / "vmae_video_mat.yaml"
    mat.write_text(yaml.safe_dump(cfg))
    cfg["optimizer"]["fused_readout"] = True
    fu = tmp / "vmae_video_fused.yaml"
    fu.write_text(yaml.safe_dump(cfg))
    return {"probe_materialized_sr": mat, "probe_fused_sr": fu}


SUITES = {
    "linear": dict(model_config="configs/model/linear_video.yaml",
                   configs=write_arm_configs, n_trials=120,
                   num_epochs=None),
    "probe": dict(model_config="configs/model/videomae/videomae.yaml",
                  configs=write_probe_arm_configs, n_trials=48,
                  num_epochs=12),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--fixture", type=str, default=None)
    ap.add_argument("--arms", type=str, default=None,
                    help="comma-separated arm names (default: all)")
    ap.add_argument("--suite", type=str, default="linear",
                    choices=sorted(SUITES))
    ap.add_argument("--num_epochs", type=int, default=None,
                    help="override the suite's epoch count")
    args = ap.parse_args()
    suite = SUITES[args.suite]

    tmp = Path(tempfile.mkdtemp(prefix="optgate_"))
    fixture = args.fixture
    if fixture is None:
        fixture = str(tmp / "fixture")
        subprocess.run(
            [sys.executable, "-m", "video_spike_tpu.cli.make_fixture",
             "--out", fixture, "--eid", "qualeid000",
             "--n_trials", str(suite["n_trials"]),
             "--n_neurons", "436", "--height", "128", "--width", "128"],
            check=True, cwd=REPO)

    num_epochs = (args.num_epochs if args.num_epochs is not None
                  else suite["num_epochs"])
    arms = set(args.arms.split(",")) if args.arms else None
    for name, cfg in suite["configs"](tmp).items():
        if arms is not None and name not in arms:
            continue
        cmd = [sys.executable, "-u", "-m", "video_spike_tpu.cli.train",
               "--model_config", suite["model_config"],
               "--train_config", str(cfg), "--eid", "qualeid000",
               "--data_dir", fixture, "--seed", str(args.seed),
               "--log_dir", str(tmp / f"logs_{name}_s{args.seed}")]
        if num_epochs is not None:
            cmd += ["--num_epochs", str(num_epochs)]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        text = out.stdout + out.stderr
        (tmp / f"arm_{name}_s{args.seed}.log").write_text(text)
        rec = {"arm": name, "seed": args.seed,
               "log": str(tmp / f"arm_{name}_s{args.seed}.log")}

        def grab(pattern):
            m = re.search(pattern, text)
            if not m:
                return None
            try:
                return float(m.group(1))
            except ValueError:   # -inf / nan / truncated output
                return m.group(1)

        rec["best_eval_bps"] = grab(r"best_eval_bps': (-?[0-9.e+-]+|-?inf|nan)")
        rec["test_bps"] = grab(r"'test_bps': (-?[0-9.e+-]+|-?inf|nan)")
        rec["wall_s"] = grab(r"trained \d+ epochs in ([0-9.]+)s")
        if out.returncode != 0:
            rec["error"] = text[-300:]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

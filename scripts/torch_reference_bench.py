"""Measured lower bound for the reference torch pipeline, on this host.

BASELINE.md's `vs_baseline` denominator is an analytic estimate of the
reference stack's A100 frames/s (no published number exists). This script
replaces trust-the-constant with measurements of the two stages that bound
the reference's throughput, using the same libraries it uses, on this
machine's CPU:

1. **Input pipeline**: decode trial mp4s (120x128x128 gray) with cv2 —
   the work `webdataset.decode(torch_video)` performs inside DataLoader
   workers for every batch of every epoch
   (``/root/reference/src/loader/base.py:24``). The reference re-decodes
   each trial every epoch; its sustained frames/s cannot exceed
   workers x per-core decode rate.
2. **Model step**: the reference's Linear model (flatten 1.97M-dim video ->
   MLP -> 100xN rates, ~504M params) + PoissonNLL + AdamW in torch
   (``/root/reference/src/model/linear.py:3-56``, batch 16) — the compute
   an A100 would accelerate, measured here on CPU as an absolute floor.

Prints one JSON line with both rates and the implied pipeline bound.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def bench_decode(n_trials: int = 12) -> float:
    """cv2 mp4 decode rate (frames/s, one core) on reference-shaped trials."""
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    tmp = tempfile.mkdtemp(prefix="refbench_")
    for k in range(n_trials):
        path = os.path.join(tmp, f"t{k}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 60,
                            (128, 128), isColor=False)
        for _ in range(120):
            w.write(rng.integers(0, 255, (128, 128), np.uint8))
        w.release()
        paths.append(path)

    # warm the page cache, then measure
    for path in paths[:2]:
        cap = cv2.VideoCapture(path)
        while cap.read()[0]:
            pass
        cap.release()
    t0 = time.perf_counter()
    frames = 0
    for path in paths:
        cap = cv2.VideoCapture(path)
        ok, _ = cap.read()
        while ok:
            frames += 1
            ok, _ = cap.read()
        cap.release()
    dt = time.perf_counter() - t0
    for path in paths:
        os.remove(path)
    return frames / dt


def bench_torch_step(steps: int = 6, batch: int = 16) -> float:
    """Reference Linear-model train step in torch on CPU: frames/s."""
    import torch

    in_dim, n_neurons = 120 * 128 * 128, 436
    model = torch.nn.Sequential(
        torch.nn.Linear(in_dim, 256), torch.nn.ReLU(),
        torch.nn.Linear(256, 128), torch.nn.ReLU(),
        torch.nn.Linear(128, 64), torch.nn.ReLU(),
        torch.nn.Linear(64, 128), torch.nn.ReLU(),
        torch.nn.Linear(128, 256), torch.nn.ReLU(),
        torch.nn.Linear(256, 100 * n_neurons),
    )
    opt = torch.optim.AdamW(model.parameters(), lr=5e-5, weight_decay=0.01)
    crit = torch.nn.PoissonNLLLoss(log_input=True)
    x = torch.rand(batch, in_dim)
    y = torch.poisson(torch.ones(batch, 100 * n_neurons))

    def step():
        opt.zero_grad(set_to_none=True)
        loss = crit(model(x), y)
        loss.backward()
        opt.step()

    step()  # warm (allocates optimizer state)
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return batch * 120 / dt


def main() -> None:
    decode_fps = bench_decode()
    workers = 8  # the reference's SLURM allocation (script/train.sh:12-13)
    step_fps = bench_torch_step()
    pipeline_bound = min(decode_fps * workers, step_fps)
    print(json.dumps({
        "decode_fps_per_core": round(decode_fps, 1),
        "decode_fps_8workers": round(decode_fps * workers, 1),
        "torch_cpu_step_fps": round(step_fps, 1),
        "pipeline_bound_fps_cpu": round(pipeline_bound, 1),
    }))


if __name__ == "__main__":
    main()

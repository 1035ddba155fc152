"""First-epoch input-pipeline micro-benchmark.

Measures cold tar->batch throughput for the three IO paths (python threads,
C++ native reader, warm cache) — the part of training the device-resident
cache cannot hide (epoch 1, or datasets over the HBM cap).

    python scripts/io_bench.py [--n_trials 64] [--dir /tmp/io_bench]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_trials", type=int, default=64)
    p.add_argument("--dir", type=str, default="/tmp/io_bench")
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args()

    from video_spike_tpu.data.dataset import SessionDataset
    from video_spike_tpu.data.synthetic import make_synthetic_session

    d = Path(args.dir)
    if not (d.exists() and len(list(d.glob("*.tar"))) >= args.n_trials):
        shutil.rmtree(d, ignore_errors=True)
        make_synthetic_session(d, eid="iobench000", n_trials=args.n_trials,
                               n_neurons=48, seed=0)
    files = sorted(str(f) for f in d.glob("*.tar"))[: args.n_trials]
    frames = args.n_trials * 120

    results = {}
    for backend in ("python", "native"):
        ds = SessionDataset(files, batch_size=args.batch_size, cache=False,
                            io_backend=backend)
        t0 = time.perf_counter()
        n = sum(b["ap"].shape[0] for b in ds)
        dt = time.perf_counter() - t0
        results[f"{backend}_cold_frames_per_s"] = round(frames / dt, 1)
        assert n == args.n_trials

    ds = SessionDataset(files, batch_size=args.batch_size, cache=True)
    _ = sum(b["ap"].shape[0] for b in ds)   # warm the cache
    t0 = time.perf_counter()
    _ = sum(b["ap"].shape[0] for b in ds)
    dt = time.perf_counter() - t0
    results["warm_cache_frames_per_s"] = round(frames / dt, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

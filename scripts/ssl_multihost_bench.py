"""SSL multihost scaling evidence: 2-process vs single-process steps/s.

The reference's only multi-device path is DDP SSL pretraining
(``/root/reference/src/pretrain.py:51-57``, ``accelerate launch`` over <=3
GPUs). ``tests/test_multiprocess_dcn.py::test_two_process_ssl_trainer``
proves the 2-process ContrastTrainer is *correct* (bit-identical best
checkpoint on every rank); this script records its *throughput* behavior —
the per-step cost of crossing a process boundary at equal global batch.

Three arms, all on the CPU backend (the only way to get 2 JAX processes on
this 1-host environment), same model/shapes/steps:

- ``single-1dev``: 1 process x 1 device, global batch B (the no-mesh floor);
- ``single-2dev``: 1 process x 2 virtual devices, data-axis mesh, global
  batch B (XLA collectives inside one process — the ICI-like arm);
- ``multi-2proc``: 2 processes x 1 device each over the gloo DCN backend,
  global batch B (rank-strided loader shards + global triplet assembly via
  ``make_array_from_process_local_data`` + gloo all-reduce — the DCN arm).

The per-step delta (multi-2proc minus single-2dev) is the process-boundary
overhead: host-side global-array assembly + gloo collectives. On a real pod
the same program rides ICI instead of gloo, so the delta measured here is a
loose UPPER bound at this model scale; BASELINE.md combines it with the
analytic ICI payload model for the 8-chip projection.

Caveat for reading the absolute numbers: on this 1-core CI host two virtual
CPU devices SERIALIZE (each is its own XLA thread pool on the same core),
so both 2-device arms run ~2x the 1-device step — compare the 2-device arms
against each other, not against ``single-1dev``.

Usage: ``python scripts/ssl_multihost_bench.py`` (orchestrates everything,
prints one JSON line). ~2 min on the 1-core CI host. Run on an idle host —
CPU contention corrupts the timing (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import tempfile

STEPS_WARMUP = 4
STEPS_TIMED = 30
BATCH_GLOBAL = 64          # frames per global triplet batch
IMAGE = 32                 # on-device resize target
MODEL_CFG = dict(
    image_size=IMAGE, patch_size=8, num_channels=1, hidden_size=64,
    num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
    decoder_hidden_size=64, decoder_num_hidden_layers=1,
    decoder_num_attention_heads=4, decoder_intermediate_size=128,
    mask_ratio=0.0, norm_pix_loss=False, embed_size=3)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_h5(path: str, eid: str) -> None:
    import h5py
    import numpy as np
    rng = np.random.default_rng(11)
    with h5py.File(path, "w") as f:
        grp = f.create_group(eid)
        t0 = 0.0
        for split, trials in {"train": 40, "val": 4, "test": 4}.items():
            X = rng.integers(0, 255, (trials, 24, 1, 32, 32), dtype=np.uint8)
            y = rng.poisson(1.0, (trials, 20, 6)).astype(np.float32)
            ts = (t0 + np.arange(trials * 24) / 60.0).reshape(trials, 24)
            t0 = ts[-1, -1] + 1.0
            grp.create_dataset(f"X_{split}", data=X)
            grp.create_dataset(f"y_{split}", data=y)
            grp.create_dataset(f"timestamp_{split}", data=ts)


def worker(h5_path: str, eid: str) -> None:
    """Time STEPS_TIMED steady-state ContrastTrainer steps; print one line
    ``worker_result={json}`` (rank 0 only)."""
    import time

    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()

    import numpy as np

    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.contrast import make_contrast_loader
    from video_spike_tpu.train.contrast import ContrastTrainer

    n_procs = jax.process_count()
    n_dev = len(jax.devices())          # global device count
    n_local = jax.local_device_count()
    # per-LOCAL-device batch so the GLOBAL batch is BATCH_GLOBAL in all arms
    # (the trainer scales the loader by its local device share)
    per_dev = BATCH_GLOBAL // n_dev
    dl, _ = make_contrast_loader(h5_path, mode="pretrain",
                                 batch_size=per_dev, eid=eid,
                                 idx_offset=3, image_size=IMAGE, seed=0)
    model = NAME2MODEL["ContrastViT"].from_config(MODEL_CFG)
    with tempfile.TemporaryDirectory() as log_dir:
        trainer = ContrastTrainer(
            model, dl, {"lr": 1e-3}, max_steps=10**9, eid=eid,
            log_dir=log_dir, image_size=IMAGE, seed=42,
            validate_every=10**9)

        def batches():
            while True:
                yield from trainer._epoch_batches()

        it = batches()
        loss = None
        for _ in range(STEPS_WARMUP):
            logs = trainer._step(next(it), 0)
            loss = logs["loss"]
        float(loss)  # sync: warmup (incl. compile) fully retired
        t0 = time.perf_counter()
        for _ in range(STEPS_TIMED):
            logs = trainer._step(next(it), 0)
            loss = logs["loss"]
        final = float(loss)  # sync once; steps chain through donated params
        dt = time.perf_counter() - t0

    if jax.process_index() == 0:
        ms = dt / STEPS_TIMED * 1e3
        print("worker_result=" + json.dumps({
            "procs": n_procs, "devices": n_dev,
            "global_batch": per_dev * n_local * n_procs,
            "ms_per_step": round(ms, 2),
            "steps_per_s": round(1e3 / ms, 2),
            "frames_per_s": round(BATCH_GLOBAL * 3 * 1e3 / ms, 1),
            "final_loss": round(final, 4)}), flush=True)


def _run_arm(n_procs: int, n_dev_per_proc: int, h5_path: str,
             eid: str) -> dict:
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_dev_per_proc}")
    env_base["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         env_base.get("PYTHONPATH", "")])
    if n_procs > 1:
        port = _free_port()
        env_base["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env_base["JAX_NUM_PROCESSES"] = str(n_procs)
    procs = []
    for pid in range(n_procs):
        env = dict(env_base)
        if n_procs > 1:
            env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--h5", h5_path, "--eid", eid],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    m = re.search(r"worker_result=(\{.*\})", outs[0])
    assert m, outs[0]
    return json.loads(m.group(1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--h5", type=str, default="")
    ap.add_argument("--eid", type=str, default="sslbench00")
    args = ap.parse_args()
    if args.worker:
        worker(args.h5, args.eid)
        return

    with tempfile.TemporaryDirectory() as d:
        h5_path = os.path.join(d, "frames.h5")
        _make_h5(h5_path, args.eid)
        arms = {
            "single_1dev": _run_arm(1, 1, h5_path, args.eid),
            "single_2dev": _run_arm(1, 2, h5_path, args.eid),
            "multi_2proc": _run_arm(2, 1, h5_path, args.eid),
        }
    overhead = round(arms["multi_2proc"]["ms_per_step"]
                     - arms["single_2dev"]["ms_per_step"], 2)
    print(json.dumps({
        "arms": arms,
        "process_boundary_overhead_ms": overhead,
        "note": ("multi_2proc minus single_2dev at equal global batch = "
                 "host assembly + gloo DCN collectives; an ICI pod's "
                 "overhead is far below this bound")}))


if __name__ == "__main__":
    main()

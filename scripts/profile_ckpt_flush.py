"""Why does the "async" periodic checkpoint flush stall the step loop?

The round-5 durability drill (scripts/ssl_durability_drill.py) measured the
periodic ``last_model`` flush at the 111M SSL shape stalling the training
loop ~60-83 s per flush — the background ``parallel_device_get`` of the
~1.33 GB params+opt tree does NOT hide behind the dispatch stream on this
host, contradicting the design intent (train/checkpoint.py
``save_checkpoint_async``). Candidate mechanisms:

- tunnel contention: the big D2H fetch saturates/starves the link the step
  loop needs for its tiny H2D index arrays and log-cadence loss fetches;
- GIL/CPU starvation: 16 fetch worker threads on a 1-core host;
- device contention: the 40+ chunk *slice* programs (`leaf[s:e]`) execute
  interleaved with (and serialized against) the training steps.

This profile reproduces the pattern in isolation on the real chip: a
donated-buffer matmul chain paced like the SSL step, with a flush fired
mid-chain under several fetch policies. For each policy it reports the
chain's stall (excess wall vs the no-flush baseline) and the fetch's own
duration — the data needed to pick a fix (fewer workers, no slicing,
paced sequential fetch).

    python scripts/profile_ckpt_flush.py [--gb 1.33] [--steps 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def paced_device_get(tree, chunk_bytes: int = 32 << 20,
                     pause_s: float = 0.05):
    """Sequential chunked fetch with a pause between chunks so the step
    stream can interleave: politeness at the cost of fetch latency."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    out = []
    for leaf in leaves:
        nbytes = getattr(leaf, "nbytes", 0)
        shape = getattr(leaf, "shape", ())
        if nbytes < 2 * chunk_bytes or not shape or shape[0] < 2:
            out.append(jax.device_get(leaf))
            time.sleep(pause_s)
            continue
        rows_per = max(int(shape[0] * chunk_bytes / nbytes), 1)
        buf = np.empty(leaf.shape, leaf.dtype)
        for s in range(0, shape[0], rows_per):
            e = min(s + rows_per, shape[0])
            buf[s:e] = jax.device_get(leaf[s:e])
            time.sleep(pause_s)
        out.append(buf)
    return jax.tree.unflatten(treedef, out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=1.33,
                    help="checkpoint tree size (the SSL 111M tree is "
                         "params+2 adam moments = ~1.33 GB f32)")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--step_ms", type=float, default=85.0,
                    help="target per-step time to mimic (chain length is "
                         "calibrated to it)")
    ap.add_argument("--arms", type=str, default=None,
                    help="comma list to run a subset (names below)")
    args = ap.parse_args()

    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    import jax
    import jax.numpy as jnp

    from video_spike_tpu.train import checkpoint as ck

    # checkpoint-like tree: a few big leaves + many small ones (the real
    # tree has ~300 leaves; the big matmul kernels dominate bytes)
    n_big = 8
    per_big = int(args.gb * 1e9 / 4 / n_big)
    rows = per_big // 4096
    key = jax.random.PRNGKey(0)
    tree = {"big": [jnp.zeros((rows, 4096), jnp.float32) + i
                    for i in range(n_big)],
            "small": [jnp.zeros((128, 64), jnp.float32)] * 64}
    tree_bytes = sum(x.nbytes for x in jax.tree.leaves(tree))

    # the paced "training" step: donated matmul chain calibrated to step_ms
    d = args.dim
    w = jax.random.normal(key, (d, d), jnp.bfloat16)

    @jax.jit
    def probe(w):
        return (w @ w).astype(jnp.bfloat16)

    x = probe(w)
    float(jnp.sum(x.astype(jnp.float32)))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(8):
        x = probe(x)
    float(jnp.sum(x.astype(jnp.float32)))
    per_mm = (time.perf_counter() - t0) / 8
    reps = max(int(args.step_ms / 1e3 / per_mm), 1)

    @jax.jit
    def step(x):
        def body(c, _):
            return (c @ c).astype(jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return y

    x = step(x)
    float(jnp.sum(x.astype(jnp.float32)))

    def run_chain(n):
        nonlocal x
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        float(jnp.sum(x.astype(jnp.float32)))  # ONE sync (CLAUDE.md rule)
        return time.perf_counter() - t0

    base = run_chain(args.steps) / args.steps
    report = {"tree_gb": round(tree_bytes / 1e9, 2),
              "chain_step_ms": round(base * 1e3, 2), "arms": {}}

    tmp = tempfile.mkdtemp(prefix="flushprof")

    # the SSL production tree's actual layout: ~300 medium leaves, every
    # one under the 64 MB chunking threshold — the tree whose plain-path
    # fallback caused the drill's 57-83 s stalls (fixed: whole-leaf
    # fetches now go through the pool too)
    n_leaf = 300
    leaf_rows = int(args.gb * 1e9 / 4 / n_leaf / 1024)
    manyleaf = [jnp.zeros((leaf_rows, 1024), jnp.float32) + i
                for i in range(n_leaf)]

    def arm(name, fetch_fn, save=False, which=None):
        """Fire fetch_fn(target) on a thread mid-chain; measure chain
        excess + fetch duration."""
        if args.arms and name not in args.arms.split(","):
            return
        target = manyleaf if which == "manyleaf" else tree
        done = {}

        def work():
            t0 = time.perf_counter()
            host = fetch_fn(target)
            done["fetch_s"] = time.perf_counter() - t0
            if save:
                t1 = time.perf_counter()
                ck.save_checkpoint(tmp, f"ck_{name}", host)
                done["write_s"] = time.perf_counter() - t1

        th = threading.Thread(target=work, daemon=True)
        t0 = time.perf_counter()
        th.start()
        wall = run_chain(args.steps)
        th.join()
        total = time.perf_counter() - t0
        report["arms"][name] = {
            "chain_excess_s": round(wall - base * args.steps, 2),
            "chain_step_ms": round(wall / args.steps * 1e3, 2),
            "fetch_s": round(done.get("fetch_s", float("nan")), 2),
            **({"write_s": round(done["write_s"], 2)} if "write_s" in done
               else {}),
            "total_s": round(total, 2)}
        print(json.dumps({name: report["arms"][name]}), flush=True)

    import functools
    arm("parallel16", ck.parallel_device_get)
    arm("parallel4", functools.partial(ck.parallel_device_get, workers=4))
    arm("plain_device_get", jax.device_get)
    arm("paced_50ms", paced_device_get)
    arm("paced_200ms",
        functools.partial(paced_device_get, pause_s=0.2))
    # the full production path (fetch + orbax write) under the winner-ish
    arm("parallel16_with_write", ck.parallel_device_get, save=True)
    # the production leaf layout through the (fixed) production fetch, and
    # through the plain path it used to silently fall back to
    arm("manyleaf_parallel", ck.parallel_device_get, which="manyleaf")
    arm("manyleaf_plain", jax.device_get, which="manyleaf")
    arm("manyleaf_with_write", ck.parallel_device_get, save=True,
        which="manyleaf")

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

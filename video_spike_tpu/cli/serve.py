"""Serve a trained model over HTTP (beyond the reference — its only
inference surface is offline evaluation, ``/root/reference/src/test.py``).

    python -m video_spike_tpu.cli.serve \
        --model_config configs/model/linear_me.yaml \
        --ckpt_dir logs/<eid5>/<mods>/LinearModel --port 8000

POST ``.npy`` bytes to ``/predict``; GET ``/stats`` for latency counters.
The model is wrapped in an InferenceSession (static-shape buckets, one XLA
compile per bucket, warmed at startup) behind a MicroBatcher (concurrent
requests coalesce into single device dispatches).
"""

from __future__ import annotations

import argparse

import numpy as np

from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.core.logging import logging as make_logger


def make_app(argv=None):
    """Parse args, load the checkpoint, warm the buckets; returns
    ``(args, session, batcher)`` — main() puts the HTTP server on top."""
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    parser = argparse.ArgumentParser(description="Serve a trained model")
    parser.add_argument("--model_config", type=str, required=True)
    parser.add_argument("--ckpt_dir", type=str, required=True)
    parser.add_argument("--ckpt_name", type=str, default="model_best")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--max_batch", type=int, default=16)
    parser.add_argument("--max_delay_ms", type=float, default=5.0)
    parser.add_argument("--input_dim", type=int, default=None,
                        help="Feature width for warmup (Linear family)")
    args = parser.parse_args(argv)

    log = make_logger(header="[serve]")
    # update_config resolves the include: (config_from_kwargs alone leaves
    # the literal string)
    config = update_config(
        config_from_kwargs({"model": f"include:{args.model_config}"}))

    from video_spike_tpu.serve import InferenceSession, MicroBatcher
    session = InferenceSession.from_checkpoint(
        config.model, args.ckpt_dir, ckpt_name=args.ckpt_name,
        bucket_sizes=(1, 2, 4, 8, args.max_batch))
    sample_ndim = None
    if args.input_dim:
        log.info("warming compile buckets...")
        row = np.zeros((args.input_dim,), np.float32)
        session.warmup(row)
        sample_ndim = row.ndim
    batcher = MicroBatcher(session.predict, max_batch=args.max_batch,
                           max_delay_ms=args.max_delay_ms,
                           sample_ndim=sample_ndim)
    log.info(f"serving on {args.host}:{args.port} "
             f"(buckets {session.buckets})")
    return args, session, batcher


def main(argv=None):
    from video_spike_tpu.serve import serve_http

    args, _, batcher = make_app(argv)
    serve_http(batcher, port=args.port, host=args.host)


if __name__ == "__main__":
    main()

"""Export a trained checkpoint as a self-contained StableHLO artifact.

    python -m video_spike_tpu.cli.export_model \
        --model_config configs/model/linear_me.yaml \
        --ckpt_dir logs/<eid5>/<mods>/LinearModel \
        --input_dim 120 --out model.stablehlo

The artifact embeds the weights and runs on any compatible JAX runtime via
``video_spike_tpu.serve.export.load_exported`` (no framework install, no
configs, no model code).
"""

from __future__ import annotations

import argparse

import numpy as np

from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.core.logging import logging as make_logger


def main(argv=None):
    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()
    parser = argparse.ArgumentParser(description="Export model to StableHLO")
    parser.add_argument("--model_config", type=str, required=True)
    parser.add_argument("--ckpt_dir", type=str, required=True)
    parser.add_argument("--ckpt_name", type=str, default="model_best")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--input_dim", type=int, default=None,
                        help="Feature width (Linear family)")
    parser.add_argument("--batch", type=int, default=8,
                        help="Sample batch (the fallback static size)")
    parser.add_argument("--static_batch", action="store_true",
                        help="Skip the polymorphic-batch attempt")
    args = parser.parse_args(argv)

    log = make_logger(header="[export]")
    # update_config resolves the include: (config_from_kwargs alone leaves
    # the literal string)
    config = update_config(
        config_from_kwargs({"model": f"include:{args.model_config}"}))

    from video_spike_tpu.serve import InferenceSession
    from video_spike_tpu.serve.export import save_exported

    if args.input_dim is None:
        raise SystemExit("--input_dim is required to shape the sample input")
    sample = np.zeros((args.batch, args.input_dim), np.float32)
    session = InferenceSession.from_checkpoint(
        config.model, args.ckpt_dir, ckpt_name=args.ckpt_name,
        sample_input=sample)
    path = save_exported(session.model, session.params, sample, args.out,
                         polymorphic_batch=not args.static_batch)
    import os
    log.info(f"exported {os.path.getsize(path)/1e6:.1f} MB -> {path}")
    return path


if __name__ == "__main__":
    main()

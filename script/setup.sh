#!/bin/bash
# One-time environment setup (parity with the reference's script/setup.sh:
# dataset fetch + environment creation; conda/env.yaml collapses into an
# editable install — jax/flax/optax/orbax are preinstalled on TPU images).
set -euo pipefail
cd "$(dirname "$0")/.."

# editable install exposes the vst-* console entry points
pip install -e .

# trial-tar dataset: either fetch the released HF dataset (needs git-lfs +
# network) or build shards locally with vst-prepare-data / vst-make-fixture
if command -v git-lfs >/dev/null 2>&1 && [ ! -d data/ibl-video ]; then
  git lfs install
  (cd data && git clone https://huggingface.co/datasets/PPWangyc/ibl-video) \
    || echo "dataset clone failed (offline?) — use vst-prepare-data instead"
fi

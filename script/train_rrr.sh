#!/bin/bash
# Reduced-rank regression from cached features.
# Usage: bash script/train_rrr.sh <input_mod>
set -euo pipefail
MOD=${1:?input modality short name, e.g. me|of-2d|all}
cd "$(dirname "$0")/.."
python -m video_spike_tpu.cli.train_rrr \
    --model_config configs/model/linear_me.yaml \
    --train_config configs/train/rrr.yaml \
    --input_mod "$MOD" "${@:2}"

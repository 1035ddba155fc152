#!/bin/bash
# Extract cached RRR features for a modality over data/eid.txt sessions.
set -euo pipefail
MOD=${1:?input modality short name}
cd "$(dirname "$0")/.."
python -m video_spike_tpu.cli.create_eid_data \
    --model_config configs/model/linear_me.yaml \
    --train_config configs/train/rrr.yaml \
    --input_mod "$MOD" "${@:2}"

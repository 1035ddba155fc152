#!/bin/bash
# Evaluate SSL checkpoints across data/eid.txt: embed + RRR + mean bps.
set -euo pipefail
MODEL=${1:?model short name m|c|cm}
cd "$(dirname "$0")/.."
python -m video_spike_tpu.cli.test \
    --model_config configs/model/vit_mae/vit_mae.yaml \
    --train_config configs/train/vmae_video.yaml \
    --model "$MODEL" "${@:2}"

#!/bin/bash
# SSL pretraining (MAE m / ContrastViT c / ContrastViTMAE cm) for one session.
# Usage: bash script/pretrain.sh <model:m|c|cm> <eid>
set -euo pipefail
MODEL=${1:?model short name m|c|cm}
EID=${2:?session eid}
cd "$(dirname "$0")/.."
python -m video_spike_tpu.cli.pretrain \
    --model_config configs/model/vit_mae/vit_mae.yaml \
    --train_config configs/train/vmae_video.yaml \
    --model "$MODEL" --eid "$EID" "${@:3}"

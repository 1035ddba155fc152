#!/bin/bash
# Supervised training for one session on the local TPU host.
# Usage: bash script/train.sh <config-name> <eid>
# (parity with the reference's SLURM script/train.sh, minus sbatch)
set -euo pipefail
CONFIG=${1:?config name, e.g. linear_me}
EID=${2:?session eid}
cd "$(dirname "$0")/.."
python -m video_spike_tpu.cli.train \
    --model_config "configs/model/${CONFIG}.yaml" \
    --train_config "configs/train/${CONFIG}.yaml" \
    --eid "$EID" "${@:3}"

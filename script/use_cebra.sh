#!/bin/bash
# CEBRA(-equivalent) embedding of one session's whisker video
# (parity with the reference's script/use_cebra.sh:19-25 job body; the SLURM
# preamble collapses into whatever scheduler wraps this script).
set -euo pipefail
EID=${1:?session eid}
cd "$(dirname "$0")/.."
python -m video_spike_tpu.cli.use_cebra \
    --model_config configs/model/linear_me.yaml \
    --train_config configs/train/rrr.yaml \
    --eid "$EID" "${@:2}"

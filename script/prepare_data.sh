#!/bin/bash
# Offline ETL: raw session -> trial tar shards.
# Usage: bash script/prepare_data.sh <eid> <out_dir> [--raw_npz raw.npz]
set -euo pipefail
EID=${1:?session eid}
OUT=${2:?output dir}
cd "$(dirname "$0")/.."
python -m video_spike_tpu.cli.prepare_data --eid "$EID" --base_path "$OUT" "${@:3}"

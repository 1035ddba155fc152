#!/bin/bash
# Aggregate test_results.npy under a log dir into the bps boxplot
# (parity with the reference's script/visualize.sh:10-13).
set -euo pipefail
LOG_DIR=${1:-results}
cd "$(dirname "$0")/.."
python -m video_spike_tpu.cli.visualize_result --log_dir "$LOG_DIR" "${@:2}"

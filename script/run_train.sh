#!/bin/bash
# Fan out supervised training over every session in data/eid.txt
# (parity with the reference's script/run_train.sh loop).
set -euo pipefail
CONFIG=${1:?config name, e.g. linear_me}
cd "$(dirname "$0")/.."
while read -r eid; do
  [ -z "$eid" ] && continue
  echo "=== training $CONFIG on $eid ==="
  bash script/train.sh "$CONFIG" "$eid" "${@:2}"
done < data/eid.txt

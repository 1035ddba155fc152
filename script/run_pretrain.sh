#!/bin/bash
# Fan out SSL pretraining over data/eid.txt.
set -euo pipefail
MODEL=${1:?model short name m|c|cm}
cd "$(dirname "$0")/.."
while read -r eid; do
  [ -z "$eid" ] && continue
  echo "=== pretraining $MODEL on $eid ==="
  bash script/pretrain.sh "$MODEL" "$eid" "${@:2}"
done < data/eid.txt

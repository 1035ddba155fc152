#!/bin/bash
# Fan out CEBRA embedding over every session in data/eid.txt
# (parity with the reference's script/run_cebra.sh:1-7 loop).
set -euo pipefail
cd "$(dirname "$0")/.."
while read -r eid; do
  [ -z "$eid" ] && continue
  echo "Processing $eid"
  bash script/use_cebra.sh "$eid" "$@"
done < data/eid.txt

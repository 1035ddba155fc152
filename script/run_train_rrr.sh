#!/bin/bash
# Fan out the RRR fit over every session in data/eid.txt
# (parity with the reference's script/run_train_rrr.sh:1-7 loop; note the
# reference's train_rr.sh receives the eid but its CLI processes every eid
# in the cached feature file regardless — behavior kept 1:1).
set -euo pipefail
MOD=${1:?input modality short name, e.g. me|of-2d|all}
cd "$(dirname "$0")/.."
while read -r eid; do
  [ -z "$eid" ] && continue
  echo "Processing $eid"
  bash script/train_rrr.sh "$MOD" "${@:2}"
done < data/eid.txt

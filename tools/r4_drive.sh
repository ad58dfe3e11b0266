#!/bin/bash
# Drive r4_probe in per-process batches (the tunnel backend crashes
# sporadically mid-matrix; each batch re-measures the `noerr` baseline
# so in-batch deltas stay valid across the process boundary).
# Usage: tools/r4_drive.sh <S_list> <out_file>
set -u
S=${1:-64}
OUT=${2:-/tmp/r4_matrix.txt}
cd "$(dirname "$0")/.."
BATCHES=(
  "noerr noerr:labyte noerr:noclip noerr,bits"
  "noerr noerr,norenorm noerr,copy noerr,stage"
  "noerr noerr,events noerr,copystage noerr,lit"
  "noerr noerr,probconst noerr,noupdate"
  "noerr '' :labyte,noclip"
)
for b in "${BATCHES[@]}"; do
  echo "--- batch: $b" | tee -a "$OUT"
  for attempt in 1 2; do
    eval "timeout 1200 python -u tools/r4_probe.py $S $b" 2>&1 \
      | grep -v WARNING | tee -a "$OUT"
    if ! grep -q FAILED <<<"$(tail -5 "$OUT")"; then break; fi
    echo "(retry after crash)" | tee -a "$OUT"
    sleep 45
  done
done

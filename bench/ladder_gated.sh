#!/bin/bash
# Probe-gated ladder collection: poll the memory-bandwidth probe and
# run one tight (local[1], local[4]) scaling pair ONLY inside a healthy
# window (fresh_gbs >= 1.2 — see BENCH/BASELINE.md host-noise
# protocol; pairs measured in a DRAM-saturated window under-report the
# engine's 4-core side 2-3x and are not publishable).
#
# Usage: bench/ladder_gated.sh <segments_dir> <events> <out_jsonl> \
#            [max_pairs] [poll_seconds] [max_runtime_s]
set -u
SEG=$1; EVENTS=$2; OUT=$3
MAX_PAIRS=${4:-6}; POLL=${5:-600}; MAX_RUNTIME=${6:-18000}
START=$(date +%s)
PAIRS=0
while [ "$PAIRS" -lt "$MAX_PAIRS" ]; do
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$MAX_RUNTIME" ]; then
    echo "deadline reached after $PAIRS pairs" >&2
    break
  fi
  BW=$(python bench/bw_probe.py 2>/dev/null)
  FRESH=$(echo "$BW" | python3 -c "import json,sys; print(json.load(sys.stdin).get('fresh_gbs') or 0)")
  OK=$(python3 -c "print(1 if float('$FRESH') >= 1.2 else 0)")
  echo "$(date +%H:%M:%S) probe fresh_gbs=$FRESH healthy=$OK pairs=$PAIRS" >&2
  if [ "$OK" = "1" ]; then
    bash "$(dirname "$0")/ladder_pair.sh" "$SEG" "$EVENTS" "$OUT"
    PAIRS=$((PAIRS + 1))
  else
    sleep "$POLL"
  fi
done
echo "collected $PAIRS pairs" >&2

#!/bin/bash
# Probe-gated sniper for the round-5 wishlist samples (cf.
# ladder_watch.sh, which fires N identical runs). The remaining
# evidence gaps are heterogeneous — one bandwidth-healthy numpy p1
# (tests the "p1 is DRAM-insensitive" claim and fills the bw-clean
# p1 n=0 cell of the PROTOCOL view), one healthy-window native p4
# (absolute-throughput headline), then extra numpy p4 (best-of-N can
# only rise) — so each healthy window fires the NEXT item of that
# priority list instead of a fixed level.
#
# Usage: bench/watch_wishlist.sh [deadline_s=14400] [min_gbs=1.2]
#
# Protocol contract (BENCH/BASELINE.md): nothing else Spark-shaped may
# run while this is armed; pid beacon below is the round-close check.
set -u
DEADLINE=${1:-14400}; MIN_GBS=${2:-1.2}
SEG=/dev/shm/cdc-seg-6400k; EVENTS=6400000

# queue entries: <CHUNKER_NATIVE> <parallelism> <out_jsonl>
QUEUE=(
  "0 1 BENCH/ladder_r4_6400k.jsonl"
  "1 4 BENCH/ladder_r5_native_6400k.jsonl"
  "0 4 BENCH/ladder_r4_6400k.jsonl"
  "0 4 BENCH/ladder_r4_6400k.jsonl"
)

PIDFILE="BENCH/watch_wishlist.pid"
START=$(date +%s)
echo "pid=$$ deadline_epoch=$((START + DEADLINE)) queue=${#QUEUE[@]}" > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

IDX=0
while :; do
  NOW=$(date +%s)
  if (( NOW - START >= DEADLINE )); then
    echo "watch: deadline (${DEADLINE}s), fired=$IDX/${#QUEUE[@]}"
    exit 0
  fi
  GBS=$(python bench/bw_probe.py 2>/dev/null | python3 -c \
      'import json,sys; print(json.load(sys.stdin).get("fresh_gbs") or 0)')
  if python3 -c "import sys; sys.exit(0 if float('$GBS') >= $MIN_GBS else 1)"; then
    read -r NATIVE P OUT <<< "${QUEUE[$IDX]}"
    echo "watch: healthy ($GBS GB/s) at t+$((NOW - START))s -> item $IDX: native=$NATIVE p$P -> $OUT"
    CHUNKER_NATIVE=$NATIVE bash bench/ladder_run.sh "$SEG" "$EVENTS" "$P" "$OUT"
    IDX=$((IDX + 1))
    if (( IDX >= ${#QUEUE[@]} )); then
      echo "watch: queue drained, fired=$IDX"
      exit 0
    fi
  else
    sleep 45
  fi
done

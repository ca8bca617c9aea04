#!/bin/bash
# Probe-gated sniper for ladder runs (cf. ladder_run.sh for one labeled
# run, ladder_pair.sh for a tight pair). The host's healthy DRAM windows
# are short (~minutes) and unpredictable; this loop polls the bandwidth
# probe and fires ONE labeled run the moment the window opens, then
# keeps watching for the next window up to a deadline.
#
# Usage: bench/ladder_watch.sh <segments_dir> <events> <parallelism> \
#            <out_jsonl> [max_fires=2] [deadline_s=2400] [min_gbs=1.2]
#
# Protocol contract (BENCH/BASELINE.md): nothing else Spark-shaped may
# run while this is armed — a concurrent job contaminates both the
# probe and the timed run.
set -u
SEG=$1; EVENTS=$2; P=$3; OUT=$4
MAX_FIRES=${5:-2}; DEADLINE=${6:-2400}; MIN_GBS=${7:-1.2}

# Armed-watcher beacon (round-4 post-mortem: a stale watcher survived
# past round close and judging had to hunt its PID). While armed, a
# pid/deadline file sits next to the output jsonl; it is removed on
# every exit path, so `ls BENCH/watch_*.pid` is the one-line
# round-close check.
PIDFILE="$(dirname "$OUT")/watch_$(basename "$OUT" .jsonl).pid"
START=$(date +%s)
echo "pid=$$ deadline_epoch=$((START + DEADLINE)) p=$P events=$EVENTS out=$OUT" > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

FIRES=0
while :; do
  NOW=$(date +%s)
  if (( NOW - START >= DEADLINE )); then
    echo "watch: deadline (${DEADLINE}s), fires=$FIRES"
    exit 0
  fi
  GBS=$(python bench/bw_probe.py 2>/dev/null | python3 -c \
      'import json,sys; print(json.load(sys.stdin).get("fresh_gbs") or 0)')
  if python3 -c "import sys; sys.exit(0 if float('$GBS') >= $MIN_GBS else 1)"; then
    echo "watch: healthy ($GBS GB/s) at t+$((NOW - START))s -> firing p$P"
    bash bench/ladder_run.sh "$SEG" "$EVENTS" "$P" "$OUT"
    FIRES=$((FIRES + 1))
    if (( FIRES >= MAX_FIRES )); then
      echo "watch: done, fires=$FIRES"
      exit 0
    fi
  else
    sleep 45
  fi
done

#!/bin/bash
# ONE labeled ladder run (cf. ladder_pair.sh, which runs a tight
# (local[1], local[4]) pair). Single-level runs exist because the host's
# two noise modes are asymmetric in parallelism (BENCH/BASELINE.md):
# co-tenant DRAM saturation barely touches a 1-core run but throttles a
# 4-core run 2-3x, while the healthy windows it leaves are shorter than
# a full pair at large event counts. The best-of-N estimator needs no
# pairing — it takes the max per level — so p1 samples can be collected
# in any steal-clean window and p4 samples sniped into probe-healthy
# windows, each run carrying its own steal + bandwidth labels exactly
# like the pair script.
#
# Usage: bench/ladder_run.sh <segments_dir> <events> <parallelism> <out_jsonl>
set -u
SEG=$1; EVENTS=$2; P=$3; OUT=$4

steal_pct() {  # args: pre-line post-line -> "total% busy%"
  python3 - "$1" "$2" <<'EOF'
import sys
pre = [int(x) for x in sys.argv[1].split()[1:]]
post = [int(x) for x in sys.argv[2].split()[1:]]
d = [b - a for a, b in zip(pre, post)]
tot = sum(d)
busy = tot - d[3] - d[4]  # minus idle, iowait
print(round(100.0 * d[7] / tot, 2) if tot else 0.0,
      round(100.0 * d[7] / busy, 2) if busy else 0.0)
EOF
}

BW=$(python bench/bw_probe.py 2>/dev/null)
PRE=$(grep '^cpu ' /proc/stat)
LINE=$(python bench/run_ingest.py --segments "$SEG" --events "$EVENTS" \
    --mean-kb 4 --batches 1 --parallelism "$P" --seed 42 --tmpfs \
    --skip-verify 2>/dev/null | tail -1)
POST=$(grep '^cpu ' /proc/stat)
read -r S SB <<< "$(steal_pct "$PRE" "$POST")"
echo "$LINE" | BW="$BW" python3 -c "
import json, os, sys
d = json.loads(sys.stdin.read())
bw = json.loads(os.environ.get('BW') or '{}')
print(json.dumps({'p': d['parallelism'], 'ev_s': d['value'],
                  'elapsed': d['elapsed_sec'], 'steal_pct': $S,
                  'steal_busy_pct': $SB,
                  'fresh_gbs': bw.get('fresh_gbs'),
                  'agg4_gbs': bw.get('agg4_gbs'),
                  'events': d['events'],
                  'sha': d['state_sha256'][:12]}))" >> "$OUT"
tail -1 "$OUT"

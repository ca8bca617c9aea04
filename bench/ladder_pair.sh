#!/bin/bash
# One tight (N, 4N) scaling pair with per-run CPU-steal accounting.
#
# The host is a shared-tenancy microVM: identical runs vary up to 6x
# with zero guest-side load, and /proc/stat's steal counter is the only
# guest-visible signal. Each run therefore records the steal share of
# its own wall-clock window; pairs measured under heavy steal are
# reported but excluded from the publishable medians (BENCH/BASELINE.md
# host-noise protocol).
#
# Usage: bench/ladder_pair.sh <segments_dir> <events> <out_jsonl>
set -u
SEG=$1; EVENTS=$2; OUT=$3

steal_pct() {  # args: pre-line post-line -> "total% busy%"
  # total% = steal share of all 32 vCPUs' time (comparable across runs);
  # busy% = steal relative to non-idle time — the figure that matters
  # for a 1-core run, where 1.4% total steal is ~45% of the one busy
  # core's time.
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

for P in 1 4; do
  # Pre-run memory-bandwidth regime probe (see bench/bw_probe.py):
  # steal can read 0 while a co-tenant saturates DRAM, which throttles
  # 4-core runs 2-3x and leaves 1-core runs untouched.
  BW=$(python bench/bw_probe.py 2>/dev/null)
  PRE=$(grep '^cpu ' /proc/stat)
  LINE=$(python bench/run_ingest.py --segments "$SEG" --events "$EVENTS" \
      --mean-kb 4 --batches 1 --parallelism $P --seed 42 --tmpfs \
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
                  'sha': d['state_sha256'][:12]}))" >> "$OUT"
done
tail -2 "$OUT"

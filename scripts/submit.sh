#!/usr/bin/env bash
# Cluster-shaped launcher: package chunker_spark and run the ingest
# benchmark through spark-submit --py-files, exactly as BASELINE.json's
# north rule specifies for the multi-executor cluster runs. On a real
# cluster, swap --master for yarn/k8s and the same zip ships to every
# executor; nothing in the engine imports from the repo checkout at
# runtime.
#
# Usage:
#   scripts/submit.sh [--parallelism N] [--events N] [extra run_ingest args...]
# Example (the N-vs-4N scaling pair):
#   scripts/submit.sh --parallelism 8  --events 200000 --seed 42
#   scripts/submit.sh --parallelism 32 --events 200000 --seed 42
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
BUILD="${TMPDIR:-/tmp}/chunker_spark_build"
ZIP="$BUILD/chunker_spark.zip"

mkdir -p "$BUILD"
rm -f "$ZIP"
(cd "$REPO" && python - "$ZIP" <<'PY'
import os, sys, zipfile
zip_path = sys.argv[1]
with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("chunker_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(f"packaged {zip_path}")
PY
)

# Parse --parallelism out of the args so spark-submit's master matches
# the executor-thread count run_ingest uses.
PAR=8
ARGS=("$@")
for ((i = 0; i < ${#ARGS[@]}; i++)); do
  if [[ "${ARGS[$i]}" == "--parallelism" ]]; then
    PAR="${ARGS[$((i + 1))]}"
  fi
done

exec spark-submit \
  --master "local[$PAR]" \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  "$REPO/bench/run_ingest.py" "$@"

#!/bin/bash
# Round-5 phase-C: EVAL_PRECAST A/B (one-time device param cast for the
# eval pipeline instead of per-dispatch cast_floating — ~0.7 GB HBM
# traffic per batch at flagship size).  Chains behind phase B.
#   bash tools/ab_bench_r5c.sh [results_file] [wait_on_log]
set -u
R="${1:-/tmp/ab_r5c.log}"
WAIT="${2:-/tmp/ab_r5b.log}"
cd "$(dirname "$0")/.."
if [ -s "$R" ]; then mv "$R" "$R.prev.$(date +%s)"; fi
echo $$ > "$R.pid"
trap 'rm -f "$R.pid"' EXIT

while ! grep -q "ALL DONE" "$WAIT" 2>/dev/null; do
  if [ -f "$WAIT.pid" ] && ! kill -0 "$(cat "$WAIT.pid")" 2>/dev/null; then
    echo "phaseC: phase-B died without marker; proceeding" >> "$R"
    break
  fi
  sleep 120
done

run() {
  local label="$1"; shift
  echo "=== $label @ $(date +%H:%M:%S)" >> "$R"
  timeout 3000 "$@" >> "$R" 2>&1
  echo "rc=$? done @ $(date +%H:%M:%S)" >> "$R"
}

EVAL=(python tools/eval_pipeline_bench.py --images 32 --batch 1 --u8)
run "eval-pipeline-precast"         env EVAL_PRECAST=1 "${EVAL[@]}"
run "eval-pipeline-precast-devres"  env EVAL_PRECAST=1 "${EVAL[@]}" --device_resident
echo "ALL DONE @ $(date +%H:%M:%S)" >> "$R"

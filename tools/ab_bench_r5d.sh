#!/bin/bash
# Round-5 phase-D: re-run the fixed precision audit (device-resident
# input + scalar fence + quantile metrics; the three programs are cached
# from phase B) and confirm the gv-bf16 train win before any default
# flip.  Chains behind phase C.
#   bash tools/ab_bench_r5d.sh [results_file] [wait_on_log]
set -u
R="${1:-/tmp/ab_r5d.log}"
WAIT="${2:-/tmp/ab_r5c.log}"
cd "$(dirname "$0")/.."
if [ -s "$R" ]; then mv "$R" "$R.prev.$(date +%s)"; fi
echo $$ > "$R.pid"
trap 'rm -f "$R.pid"' EXIT

while ! grep -q "ALL DONE" "$WAIT" 2>/dev/null; do
  if [ -f "$WAIT.pid" ] && ! kill -0 "$(cat "$WAIT.pid")" 2>/dev/null; then
    echo "phaseD: upstream died without marker; proceeding" >> "$R"
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

TRAIN=(python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_coco.py
       --train --batch 4 --compute_dtype bfloat16)

run "precision-audit-v2"      python tools/precision_audit.py --iters 30
run "train-baseline-confirm"  "${TRAIN[@]}"
run "train-gv-bf16-confirm"   env MSDA_BWD_GV_BF16=1 "${TRAIN[@]}"
echo "ALL DONE @ $(date +%H:%M:%S)" >> "$R"

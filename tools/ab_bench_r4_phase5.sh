#!/bin/bash
# Round-4 phase-5 queue — chains behind tools/ab_bench_r4.sh ("R4 DONE").
#   bash tools/ab_bench_r4.sh.phase5 [results_file] [wait_on_log]
# Contents: OPT_FLAT flat-buffer AdamW (opt_microbench device A/B vs the
# 20.6 ms/step HEAD measurement, then the train e2e).
set -u
R="${1:-/tmp/ab_r4p5.log}"
WAIT="${2:-}"
cd "$(dirname "$0")/.."
if [ -n "$WAIT" ]; then
  START=$(date +%s)
  while ! grep -q "R4 DONE" "$WAIT" 2>/dev/null; do
    if [ $(( $(date +%s) - START )) -gt 21600 ]; then
      echo "phase5: r4 marker never appeared after 6h; proceeding" >> "$R"
      break
    fi
    sleep 60
  done
fi
run() {
  local label="$1"; shift
  echo "=== $label @ $(date +%H:%M:%S)" >> "$R"
  local t0=$(date +%s)
  timeout 4000 "$@" >> "$R" 2>&1
  echo "rc=$? done @ $(date +%H:%M:%S) (wall $(( $(date +%s) - t0 ))s)" >> "$R"
}
run "opt-microbench-OPT_FLAT" env OPT_FLAT=1 python tools/opt_microbench.py --profile /tmp/trace_opt_flat
run "train-OPT_FLAT" env OPT_FLAT=1 python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_coco.py --train --batch 4 --compute_dtype bfloat16
echo "PHASE5 DONE @ $(date +%H:%M:%S)" >> "$R"

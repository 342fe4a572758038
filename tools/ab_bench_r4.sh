#!/bin/bash
# Round-4 on-chip queue — chains behind tools/ab_bench_phase2.sh (waits for
# its "PHASE2 DONE" marker; serialized: ONE TPU process at a time).
#
#   bash tools/ab_bench_r4.sh [results_file] [wait_on_log]
#
# Contents (2026-08-20, written while phase-1/2 run):
#   1. train-baseline at the NEW defaults (HUNGARIAN_RR=1 flipped on the
#      morning A/B; this program == the morning's train-HUNGARIAN_RR run,
#      so it should hit the compile cache) — same-session re-baseline.
#   2. ENC_SCAN=1 train + fwd: the scanned encoder (one compiled layer
#      body instead of 6).  Measures BOTH compile wall (the >20-min
#      fresh-compile pain) and step time.  One gate, one run each.
#   3. eval_pipeline_bench at flagship: pipeline img/s vs raw fwd img/s
#      (VERDICT r3 item 5).  Fresh eval_step compile.
# Failure of any run is informational — later runs still fire.
set -u
R="${1:-/tmp/ab_r4.log}"
WAIT="${2:-}"
cd "$(dirname "$0")/.."

if [ -n "$WAIT" ]; then
  START=$(date +%s)
  while ! grep -q "PHASE2 DONE" "$WAIT" 2>/dev/null; do
    if [ $(( $(date +%s) - START )) -gt 14400 ]; then
      echo "r4 queue: phase-2 marker never appeared after 4h; proceeding" >> "$R"
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

TRAIN=(python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_coco.py
       --train --batch 4 --compute_dtype bfloat16)

run "train-baseline-newdefaults" "${TRAIN[@]}"
run "train-ENC_SCAN"             env ENC_SCAN=1 "${TRAIN[@]}"
run "fwd-ENC_SCAN"               env ENC_SCAN=1 python bench.py
run "eval-pipeline-flagship"     python tools/eval_pipeline_bench.py --images 32 --batch 1
echo "R4 DONE @ $(date +%H:%M:%S)" >> "$R"

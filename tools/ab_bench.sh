#!/bin/bash
# On-chip A/B protocol for env-gated kernel candidates (BENCH_NOTES.md).
# Run from the repo root with the axon TPU reachable; ONE TPU process at a
# time — this script serializes.
#
#   bash tools/ab_bench.sh [results_file]
#
# Protocol (CLAUDE.md "measured-defaults discipline"):
#   1. re-measure the baseline IN THE SAME SESSION (tunnel-day variance);
#   2. flip exactly ONE gate per run against the measured defaults
#      (tests/test_gate_defaults.py pins them);
#   3. record wins by flipping the default + a BENCH_NOTES trail row,
#      losses as dead-end rows — either way the number lands in the notes.
#
# Round-5 queue (written at round-4 end): the XLA-flag probes lost 4x to
# the oscillating tunnel on 2026-08-20 — they are the first unmeasured
# candidates; then fresh re-baselines at the round-4 defaults
# (HUNGARIAN_RR=1, u8_images=1).  fwd/train/entry programs are cache-
# seeded at these defaults (re-seed after ANY model-code change).
set -u
R="${1:-/tmp/ab_results.log}"
cd "$(dirname "$0")/.."
# rotate any prior results file: a stale "ALL DONE" marker from an earlier
# session would green-light a chained phase-2 immediately and run TWO
# concurrent TPU processes (ADVICE r3)
if [ -s "$R" ]; then mv "$R" "$R.prev.$(date +%s)"; fi
# liveness marker for chained queues (ADVICE r4): phase-2 checks this PID
# before proceeding past its bounded wait, so a slow-but-alive phase-1
# can't be overlapped by a second TPU process
echo $$ > "$R.pid"
trap 'rm -f "$R.pid"' EXIT

run() {
  local label="$1"; shift
  echo "=== $label @ $(date +%H:%M:%S)" >> "$R"
  timeout 3000 "$@" >> "$R" 2>&1
  echo "rc=$? done @ $(date +%H:%M:%S)" >> "$R"
}

TRAIN=(python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_coco.py
       --train --batch 4 --compute_dtype bfloat16)

run "fwd-baseline-HEAD"      python bench.py
run "train-baseline"         "${TRAIN[@]}"
# XLA-flag probes REMOVED (closed out 2026-08-20, r5): the xla_tpu_*
# compiler flags are unknown to this jaxlib (fatal abort at init — what
# looked like 6x tunnel losses was flag rejection) and the axon
# remote_compile service takes no client-side compiler flags.

# Fresh attribution at the HEAD defaults (feeds the next optimization pick):
PROF=(python tools/profile.py -c open_groundingdino_tpu/config/cfg_coco.py)
run "profile-fwd-HEAD"       "${PROF[@]}" --batch 1 --iters 10 -o /tmp/trace_fwd_head
run "profile-train-HEAD"     "${PROF[@]}" -o /tmp/trace_train_head --train

# Deployment + pipeline surfaces at current defaults:
run "eval-pipeline-u8"  python tools/eval_pipeline_bench.py --images 32 --batch 1 --u8
run "serving-latency"   python tools/serving_bench.py
echo "ALL DONE @ $(date +%H:%M:%S)" >> "$R"

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
# As of 2026-08-19 (evening) every queued candidate has been measured
# (QB256/band sweep, MSDA_BAND_BWD, BENCH_SCAN, B-sweep, and the three
# scatter-family kills HUNGARIAN_MASKED / FUSION_RV_SLICES /
# ENC_TAKE_GATHER — all flipped ON: see BENCH_NOTES round-3 trail); the
# template below re-baselines and captures fresh profiles — add new
# one-gate runs after the baseline rows.
set -u
R="${1:-/tmp/ab_results.log}"
cd "$(dirname "$0")/.."
# rotate any prior results file: a stale "ALL DONE" marker from an earlier
# session would green-light a chained phase-2 immediately and run TWO
# concurrent TPU processes (ADVICE r3)
if [ -s "$R" ]; then mv "$R" "$R.prev.$(date +%s)"; fi

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
# >>> one-gate candidate runs (2026-08-20 queue):
# JV row-reduction pre-pass for the device Hungarian (targets the
# 15.7 ms while-loop bucket; program change -> fresh train compile)
run "train-HUNGARIAN_RR"     env HUNGARIAN_RR=1 "${TRAIN[@]}"
# XLA flag probes, fwd only (fresh ~5 min compile each; failures are
# informational — unknown flags abort that run only)
run "fwd-xla-vmem64m"        env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python bench.py
run "fwd-xla-no-lhs"         env XLA_FLAGS=--xla_tpu_enable_latency_hiding_scheduler=false python bench.py

# Fresh attribution at the HEAD defaults (feeds the next optimization pick):
PROF=(python tools/profile.py -c open_groundingdino_tpu/config/cfg_coco.py)
run "profile-fwd-HEAD"       "${PROF[@]}" --batch 1 --iters 10 -o /tmp/trace_fwd_head
run "profile-train-HEAD"     "${PROF[@]}" -o /tmp/trace_train_head --train

# Informational breadth datapoints (other model families, same kernels):
run "fwd-swinb-info"    python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_swinb.py --batch 4 --compute_dtype bfloat16
run "fwd-swinl-info"    python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_swinl.py --batch 4 --compute_dtype bfloat16
run "fwd-resnet50-info" python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_resnet50.py --batch 4 --compute_dtype bfloat16
echo "ALL DONE @ $(date +%H:%M:%S)" >> "$R"

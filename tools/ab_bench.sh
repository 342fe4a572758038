#!/bin/bash
# On-chip A/B queue for the env-gated kernel candidates (BENCH_NOTES.md
# "Pending on-chip A/Bs").  Run from the repo root with the axon TPU
# reachable; ONE TPU process at a time — this script serializes.
#
#   bash tools/ab_bench.sh [results_file]
#
# Each candidate flips exactly one gate against the measured-default
# baseline (tests/test_gate_defaults.py).  Record wins by flipping the
# default + adding a BENCH_NOTES trail row; record losses as dead ends.
set -u
R="${1:-/tmp/ab_results.log}"
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  echo "=== $label @ $(date +%H:%M:%S)" >> "$R"
  timeout 2400 "$@" >> "$R" 2>&1
  echo "rc=$? done @ $(date +%H:%M:%S)" >> "$R"
}

TRAIN=(python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_coco.py
       --train --batch 4 --compute_dtype bfloat16)

run "fwd-baseline-HEAD"      python bench.py
run "fwd-MSDA_MP_V2"         env MSDA_MP_V2=1 python bench.py
run "fwd-SWIN_ATTN_PALLAS"   env SWIN_ATTN_PALLAS=1 python bench.py
run "train-baseline"         "${TRAIN[@]}"
run "train-MSDA_BWD_V2"      env MSDA_BWD_V2=1 "${TRAIN[@]}"
run "train-SWIN_ATTN_PALLAS" env SWIN_ATTN_PALLAS=1 "${TRAIN[@]}"
# measured 2026-08-18 (all dead-end/neutral, kept for re-checks):
# LN_PALLAS_RES / MLP_PALLAS / MLP_PALLAS+MLP_PALLAS_SWIN=0 / SWIN_BHND /
# MSDA_SSA_BAND / REMAT_SAVE_KERNELS (won, now default) / MSDA_BANDED_MP_BWD

# Fresh attribution at the HEAD defaults (feeds the next optimization pick):
PROF=(python tools/profile.py -c open_groundingdino_tpu/config/cfg_coco.py)
run "profile-fwd-HEAD"       "${PROF[@]}" -o /tmp/trace_fwd_r3
run "profile-train-HEAD"     "${PROF[@]}" -o /tmp/trace_train_r3 --train

# Informational breadth datapoints (other model families, same kernels):
run "fwd-swinb-info"   python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_swinb.py --batch 4 --compute_dtype bfloat16
run "fwd-resnet50-info" python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_resnet50.py --batch 4 --compute_dtype bfloat16
echo "ALL DONE @ $(date +%H:%M:%S)" >> "$R"

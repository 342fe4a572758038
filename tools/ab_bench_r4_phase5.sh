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

# Final: re-seed /tmp/jax_cache with the HEAD-default fwd program for the
# driver's end-of-round bench.py (the injective-take rework may have
# changed the traced fwd program; CLAUDE.md cache-seeding rule).  Also the
# round-4 post-queue baseline record.
run "fwd-baseline-reseed" python bench.py
echo "PHASE5B DONE @ $(date +%H:%M:%S)" >> "$R"

# clean same-session fwd A/B: default (just re-seeded above) vs the scan
# program (cached at 12:41) back to back
run "fwd-ENC_SCAN-cached" env ENC_SCAN=1 python bench.py
echo "PHASE5C DONE @ $(date +%H:%M:%S)" >> "$R"

# re-measure the eval pipeline with the JITTED PostProcess.device (single
# dispatch vs ~10 eager op RTTs per batch) — same protocol as the 12:44
# run (ratio 0.058; steady-state 0.49 s/it was mostly postprocess RTT)
run "eval-pipeline-jitpost" python tools/eval_pipeline_bench.py --images 32 --batch 1
echo "PHASE5D DONE @ $(date +%H:%M:%S)" >> "$R"

# OPT_FLAT retry with 2-D (rows,1024) flat buffers (the 1-D concat OOMed
# in a pathological T(8,128) layout of a f32[N,3] intermediate — fixed)
run "opt-microbench-OPT_FLAT-2d" env OPT_FLAT=1 python tools/opt_microbench.py --profile /tmp/trace_opt_flat2
run "train-OPT_FLAT-2d" env OPT_FLAT=1 python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_coco.py --train --batch 4 --compute_dtype bfloat16
echo "PHASE5E DONE @ $(date +%H:%M:%S)" >> "$R"

# OPT_FLAT retry 2: optimization_barriers between the m/v/update chains
# (XLA horizontally fused them into a f32[N,3] T(8,128) 23 GB intermediate)
run "opt-microbench-OPT_FLAT-bar" env OPT_FLAT=1 python tools/opt_microbench.py --profile /tmp/trace_opt_flat3
run "eval-pipeline-packed" python tools/eval_pipeline_bench.py --images 32 --batch 1
echo "PHASE5F DONE @ $(date +%H:%M:%S)" >> "$R"

# eval pipeline at B=4: amortizes the per-batch tunnel costs (input
# upload + dispatch/fetch RTTs) over 4 images — the engine's real batch
run "eval-pipeline-b4" python tools/eval_pipeline_bench.py --images 32 --batch 4
echo "PHASE5G DONE @ $(date +%H:%M:%S)" >> "$R"

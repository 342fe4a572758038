#!/bin/bash
# Round-5 phase-B measurement queue: precision audit (VERDICT r5 item 3),
# gv-bf16 backward candidate (item 7), matcher attribution (item 6),
# device-resident eval pipeline (item 5), plus XLA-flag probe re-runs if
# phase A lost them to the tunnel.  Chains behind tools/ab_bench.sh
# (ONE TPU process at a time): waits for the phase-A "ALL DONE" marker
# (or its recorded death), then health-checks the tunnel before firing.
#
#   bash tools/ab_bench_r5b.sh [results_file] [wait_on_log]
set -u
R="${1:-/tmp/ab_r5b.log}"
WAIT="${2:-/tmp/ab_r5.log}"
cd "$(dirname "$0")/.."
if [ -s "$R" ]; then mv "$R" "$R.prev.$(date +%s)"; fi
echo $$ > "$R.pid"
trap 'rm -f "$R.pid"' EXIT

# -- wait for phase A (marker, else dead pid) --------------------------------
if [ -n "$WAIT" ]; then
  while ! grep -q "ALL DONE" "$WAIT" 2>/dev/null; do
    if [ -f "$WAIT.pid" ] && ! kill -0 "$(cat "$WAIT.pid")" 2>/dev/null; then
      echo "phaseB: phase-A died without marker; proceeding" >> "$R"
      break
    fi
    if [ ! -f "$WAIT.pid" ] && [ ! -s "$WAIT" ]; then
      echo "phaseB: no phase-A evidence at all; proceeding" >> "$R"
      break
    fi
    sleep 60
  done
fi

# -- tunnel health gate (fresh trivial compile < 10 s, tunnel_watch recipe) --
until timeout 120 python - <<'EOF' >/dev/null 2>&1
import sys, time
import jax, jax.numpy as jnp
d = jax.devices()[0]
t0 = time.time()
k = float(time.time() % 997)
jax.jit(lambda a: a * k + jnp.tanh(a))(jnp.ones((128, 128))).block_until_ready()
sys.exit(0 if time.time() - t0 < 10.0 else 1)
EOF
do
  echo "phaseB: tunnel down-or-degraded @ $(date +%H:%M:%S)" >> "$R"
  sleep 300
done
echo "phaseB: tunnel healthy @ $(date +%H:%M:%S)" >> "$R"

run() {
  local label="$1"; shift
  echo "=== $label @ $(date +%H:%M:%S)" >> "$R"
  timeout 3000 "$@" >> "$R" 2>&1
  echo "rc=$? done @ $(date +%H:%M:%S)" >> "$R"
}

TRAIN=(python tools/benchmark.py -c open_groundingdino_tpu/config/cfg_coco.py
       --train --batch 4 --compute_dtype bfloat16)

# same-session baselines (tunnel-day variance rule)
run "fwd-baseline"           python bench.py
run "train-baseline"         "${TRAIN[@]}"

# XLA-flag probes via the LOCAL parser: CLOSED OUT 2026-08-20 (r5) — the
# xla_tpu_* flags are unknown to this jaxlib (fatal abort at init; the
# binary's DebugOptions has no xla_tpu_* compiler fields).  One loophole
# remains: the axon client reads XLA_FLAGS per-request for its compile
# cache hash (axon/register/pjrt.py:213-215) — the probe below decides
# whether post-init env values reach the REMOTE compiler at all, and if
# they do, the bench rows A/B the vmem limit through BENCH_POST_XLA_FLAGS.
# seed the ENC_SCAN fwd program (bench.py's degraded-tunnel fallback)
# into /tmp/jax_cache + re-confirm its fwd neutrality at current HEAD
run "fwd-enc-scan-seed"      env ENC_SCAN=1 BENCH_NO_SUPERVISE=1 python bench.py

run "xla-flag-forwarding-probe" python tools/xla_flag_probe.py
run "fwd-xla-vmem64m-postinit"  env BENCH_POST_XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python bench.py

# precision policy audit (VERDICT item 3): 3 fresh flagship compiles
run "precision-audit"        python tools/precision_audit.py --iters 10

# gv-bf16 backward candidate (item 7): timing A/B + fixed-seed loss curves
run "train-gv-bf16"          env MSDA_BWD_GV_BF16=1 "${TRAIN[@]}"
run "losscurve-base"         "${TRAIN[@]}" --loss_curve --iters 30
run "losscurve-gv-bf16"      env MSDA_BWD_GV_BF16=1 "${TRAIN[@]}" --loss_curve --iters 30

# matcher attribution (item 6): decide the fused-cost-kernel lever
run "matcher-full"           python tools/matcher_microbench.py --profile /tmp/trace_matcher
run "matcher-costs-only"     python tools/matcher_microbench.py --costs_only
run "matcher-assign-only"    python tools/matcher_microbench.py --assign_only

# eval pipeline: transfer-bound vs device-resident ceiling (item 5)
run "eval-pipeline-u8"       python tools/eval_pipeline_bench.py --images 32 --batch 1 --u8
run "eval-pipeline-devres"   python tools/eval_pipeline_bench.py --images 32 --batch 1 --u8 --device_resident
echo "ALL DONE @ $(date +%H:%M:%S)" >> "$R"

#!/bin/bash
# Phase-2 on-chip measurements, run AFTER tools/ab_bench.sh completes
# (serialized: ONE TPU process at a time — pass the ab_bench results file
# as $2 and this script waits for its "ALL DONE" marker first).
#
#   bash tools/ab_bench_phase2.sh [results_file] [wait_on_log]
#
# Contents (2026-08-20 queue, written while the phase-1 queue ran):
#   1. optimizer-share sizing (tools/opt_microbench.py --profile): decides
#      whether a flat-per-group fused AdamW is worth building (round-4
#      lever 2 — the 153 ms/step XLA-fusion long tail; per-leaf optimizer
#      lowering is a suspect).  DEVICE time, robust to tunnel RTT.
#   2. MSDA microbench at HEAD defaults with a device profile — fresh
#      per-bucket attribution for the round-4 backward levers.
set -u
R="${1:-/tmp/ab_phase2.log}"
WAIT="${2:-}"
cd "$(dirname "$0")/.."

if [ -n "$WAIT" ]; then
  # bounded wait (ADVICE r3): a phase-1 killed before writing its marker
  # (tunnel drop) must not park this queue forever — bail after 4h and
  # log; ab_bench.sh also rotates stale results files so an old marker
  # can't green-light an overlapping run
  START=$(date +%s)
  while ! grep -q "ALL DONE" "$WAIT" 2>/dev/null; do
    if [ $(( $(date +%s) - START )) -gt 14400 ]; then
      # ADVICE r4: a slow-tunnel phase-1 can legitimately exceed 4h while
      # still RUNNING — overlapping it would break the one-TPU-process
      # rule.  ab_bench.sh writes its PID to $WAIT.pid (cleared on exit);
      # keep waiting while that process is alive, proceed only once dead.
      if [ -f "$WAIT.pid" ] && kill -0 "$(cat "$WAIT.pid")" 2>/dev/null; then
        echo "phase2: 4h elapsed but phase-1 (pid $(cat "$WAIT.pid")) is still alive; continuing to wait" >> "$R"
        START=$(date +%s)
        sleep 60
        continue
      fi
      echo "phase2: phase-1 marker never appeared after 4h and no live phase-1 process; proceeding" >> "$R"
      break
    fi
    sleep 60
  done
fi

run() {
  local label="$1"; shift
  echo "=== $label @ $(date +%H:%M:%S)" >> "$R"
  timeout 3000 "$@" >> "$R" 2>&1
  echo "rc=$? done @ $(date +%H:%M:%S)" >> "$R"
}

run "opt-microbench-HEAD" python tools/opt_microbench.py --profile /tmp/trace_opt_head
run "msda-microbench-HEAD" python tools/msda_microbench.py --profile /tmp/trace_msda_head
echo "PHASE2 DONE @ $(date +%H:%M:%S)" >> "$R"

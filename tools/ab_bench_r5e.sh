#!/bin/bash
# Round-5 phase-E: clean EVAL_PRECAST A/B (the phase-C runs were
# compile-tainted — the tool now pre-warms the bf16-param program and
# uses the persistent cache).  Chains behind phase D.
set -u
R="${1:-/tmp/ab_r5e.log}"
WAIT="${2:-/tmp/ab_r5d.log}"
cd "$(dirname "$0")/.."
if [ -s "$R" ]; then mv "$R" "$R.prev.$(date +%s)"; fi
echo $$ > "$R.pid"
trap 'rm -f "$R.pid"' EXIT
while ! grep -q "ALL DONE" "$WAIT" 2>/dev/null; do
  if [ -f "$WAIT.pid" ] && ! kill -0 "$(cat "$WAIT.pid")" 2>/dev/null; then
    echo "phaseE: upstream died; proceeding" >> "$R"; break
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
run "eval-noprecast-devres"   "${EVAL[@]}" --device_resident
run "eval-precast-devres"     env EVAL_PRECAST=1 "${EVAL[@]}" --device_resident
run "eval-precast-plain"      env EVAL_PRECAST=1 "${EVAL[@]}"
echo "ALL DONE @ $(date +%H:%M:%S)" >> "$R"

#!/bin/bash
# Poll the axon tunnel; when the chip answers, run the serialized A/B queue
# (tools/ab_bench.sh) exactly once.  Safe to leave running in the background:
# every probe is timeout-wrapped (jax.devices() hangs when the tunnel is
# down — CLAUDE.md), and only one TPU process ever runs at a time.
set -u
cd "$(dirname "$0")/.."
R="${1:-/tmp/ab_results.log}"
STAMP=/tmp/tunnel_watch.state
echo "watch start $(date +%H:%M:%S)" > "$STAMP"
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel UP $(date +%H:%M:%S) — running ab_bench" >> "$STAMP"
    bash tools/ab_bench.sh "$R"
    echo "ab_bench finished $(date +%H:%M:%S)" >> "$STAMP"
    exit 0
  fi
  echo "down $(date +%H:%M:%S)" >> "$STAMP"
  sleep 300
done

#!/bin/bash
# Poll the axon tunnel; when the chip is HEALTHY, run the serialized A/B
# queue (tools/ab_bench.sh) exactly once.  Safe to leave running in the
# background: every probe is timeout-wrapped (jax.devices() hangs when the
# tunnel is down — CLAUDE.md), and only one TPU process ever runs at a time.
#
# Health = device visible AND a fresh trivial compile lands in < 10 s.
# The tunnel has a degraded mode (2026-08-20) where dispatches are fine but
# remote COMPILES run 30-50x slow — jax.devices() alone would green-light
# ab_bench into a multi-hour compile tar pit.  Trivial compiles are below
# the persistent-cache min-compile-time threshold, so the probe never hits
# the cache and measures the real compile path every time.
set -u
cd "$(dirname "$0")/.."
R="${1:-/tmp/ab_results.log}"
STAMP=/tmp/tunnel_watch.state
echo "watch start $(date +%H:%M:%S)" > "$STAMP"
while true; do
  if timeout 120 python - <<'EOF' >/dev/null 2>&1
import sys, time
import jax, jax.numpy as jnp
d = jax.devices()[0]
t0 = time.time()
k = float(time.time() % 997)  # cache-buster constant
jax.jit(lambda a: a * k + jnp.tanh(a))(jnp.ones((128, 128))).block_until_ready()
dt = time.time() - t0
sys.exit(0 if dt < 10.0 else 1)
EOF
  then
    echo "tunnel HEALTHY $(date +%H:%M:%S) — running ab_bench" >> "$STAMP"
    bash tools/ab_bench.sh "$R"
    echo "ab_bench finished $(date +%H:%M:%S)" >> "$STAMP"
    exit 0
  fi
  echo "down-or-degraded $(date +%H:%M:%S)" >> "$STAMP"
  sleep 300
done

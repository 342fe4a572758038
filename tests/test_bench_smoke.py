"""bench.py driver-contract smoke: the script must print exactly one JSON
line with the agreed keys on a CPU-only host (the driver runs it on the
real chip; the CPU fallback path keeps the contract testable here).

Runs as a subprocess like the e2e tests: bench.py owns process-level env
(platform selection, compilation cache), and in-process imports would fight
the conftest's CPU-mesh pinning."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1500, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout
    return json.loads(lines[0])


@pytest.mark.slow
def test_bench_contract_json_line():
    rec = _run_bench({})
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0


@pytest.mark.slow
def test_bench_scan_mode_contract():
    # BENCH_SCAN: single lax.scan dispatch (env-gated, default off — the
    # measured dead end stays exercisable)
    rec = _run_bench({"BENCH_SCAN": "2"})
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0

"""Real 2-process distributed eval merge (round-2 VERDICT missing #4).

Launches TWO actual OS processes that jax.distributed.initialize over a
localhost coordinator (4 virtual CPU devices each), split the synthetic
prediction set between them, and merge evaluator records across hosts with
multihost_utils.process_allgather — the first time the real multi-process
transport runs in this repo (before this, eval merging was only unit-tested
single-process).  The merged stats must equal a single-process run on the
full set (reference equivalent: NCCL all_gather of pickled eval arrays,
util/misc.py:96-137 + cocogrounding_eval.py:181-210)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "two_process_eval_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_eval_merge_equals_single(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # the worker sets its own device count; scrub the 8-device test flag
    env["XLA_FLAGS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(pid), "2", str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    with open(tmp_path / "dist_stats.json") as f:
        dist_stats = json.load(f)

    # single-process oracle on the full set
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import two_process_eval_worker as w
    from open_groundingdino_tpu.eval.coco_eval import CocoBboxEvaluator

    ev = CocoBboxEvaluator(w.make_index(), use_native=False)
    ev.update(w.make_predictions())
    ev.accumulate()
    ref_stats = ev.summarize()

    assert set(dist_stats) == set(ref_stats)
    for k in ref_stats:
        np.testing.assert_allclose(
            dist_stats[k], ref_stats[k], atol=1e-9,
            err_msg=f"{k} differs between 2-process merge and single process",
        )
    # sanity: the scenario is non-trivial (some but not perfect AP)
    assert 0.0 < ref_stats["AP"] <= 1.0

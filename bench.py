#!/usr/bin/env python3
"""Throughput benchmark: Swin-T GroundingDINO zero-shot forward,
COCO-eval-shaped inputs (800x1216 bucket, 256-token caption), bf16 compute.

Prints ONE JSON line:
  {"metric": "COCO val2017 images/sec/chip (Swin-T)", "value": N,
   "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline is relative to the reference PyTorch implementation on A100
(~9 images/sec at the same eval resolution — BASELINE.md's implied
tools/benchmark.py number; the repo publishes no official throughput, so the
constant is documented here and kept fixed across rounds for comparability).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

A100_BASELINE_IPS = 9.0


def _probe_platform(timeout_s: float = 90.0):
    """First-device platform via a subprocess, or None if unreachable.

    jax.devices() HANGS in-process when the axon tunnel is down (CLAUDE.md),
    so the probe must run out-of-process under a hard timeout."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True,
        )
        if r.returncode == 0 and r.stdout.strip():
            return r.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        pass
    return None


def _wait_for_device() -> str:
    """Bounded wait for a reachable device (the axon tunnel flaps for hours
    at a time; BENCH_TUNNEL_WAIT_S bounds how long we retry before giving
    up with a clean error instead of hanging the driver)."""
    budget = float(os.environ.get("BENCH_TUNNEL_WAIT_S", "900"))
    deadline = time.monotonic() + budget
    while True:
        plat = _probe_platform()
        if plat is not None:
            return plat
        if time.monotonic() >= deadline:
            print("bench.py: device unreachable (axon tunnel down) after "
                  f"{budget:.0f}s of retries", file=sys.stderr)
            sys.exit(3)
        print("bench.py: device probe timed out; retrying "
              f"(deadline in {deadline - time.monotonic():.0f}s)",
              file=sys.stderr)
        time.sleep(60)


def _compile_health(timeout_s: float = 120.0):
    """Trivial fresh-compile probe (tunnel_watch.sh recipe): returns the
    compile seconds, or None if unreachable.  The tunnel has a DEGRADED
    mode where dispatches work but remote compiles run 30-50x slow
    (CLAUDE.md) — a trivial compile stays under the persistent-cache
    min-compile threshold, so it measures the real compile path."""
    import subprocess

    code = (
        "import sys, time\n"
        "import jax, jax.numpy as jnp\n"
        "d = jax.devices()[0]\n"
        "t0 = time.time()\n"
        "k = float(time.time() % 997)\n"
        "jax.jit(lambda a: a * k + jnp.tanh(a))(jnp.ones((128, 128)))"
        ".block_until_ready()\n"
        "print(time.time() - t0)\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s, text=True)
        if r.returncode == 0 and r.stdout.strip():
            return float(r.stdout.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, ValueError):
        pass
    return None


def _supervise() -> int:
    """Bounded-wall supervisor (VERDICT r5 item 10): run the measurement in
    a child under BENCH_WALL_S; if the wall is hit (a fresh compile on a
    degraded tunnel can run 30-50x slow), retry ONCE with ENC_SCAN=1 —
    the ~8x-faster-compiling encoder program (measured fwd -0.3%,
    BENCH_NOTES r4) — marking the fallback on stderr.  Guarantees bench.py
    never hangs past ~2x the wall."""
    import subprocess

    wall = float(os.environ.get("BENCH_WALL_S", "2700"))
    health = _compile_health()
    if health is not None and health > 10.0:
        print(f"bench.py: tunnel compile-DEGRADED (trivial compile "
              f"{health:.1f}s > 10s); cached programs only are viable",
              file=sys.stderr)

    env = dict(os.environ, BENCH_CHILD="1")
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           timeout=wall, env=env)
        if r.returncode == 0:
            return 0
        if r.returncode == 3:
            return 3  # device unreachable — a different program won't help
    except subprocess.TimeoutExpired:
        print(f"bench.py: wall {wall:.0f}s exceeded (compile-bound); "
              "falling back to the ENC_SCAN=1 fast-compile program",
              file=sys.stderr)
    if os.environ.get("ENC_SCAN", "0") == "1":
        return 3  # fallback already active; give up
    env["ENC_SCAN"] = "1"
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           timeout=wall, env=env)
        return r.returncode
    except subprocess.TimeoutExpired:
        print("bench.py: ENC_SCAN fallback also exceeded the wall",
              file=sys.stderr)
        return 3


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    _wait_for_device()
    import jax
    import jax.numpy as jnp

    # BENCH_POST_XLA_FLAGS: set XLA_FLAGS *after* backend init.  The local
    # jaxlib's flag parser fatally aborts on unknown (e.g. any xla_tpu_*)
    # flags at init, but the axon remote-compile client hashes/forwards
    # the env per request (axon/register/pjrt.py:213-215), so a post-init
    # value reaches the REMOTE compiler without tripping the local parse.
    if os.environ.get("BENCH_POST_XLA_FLAGS"):
        jax.devices()  # force init under the original (parseable) env
        os.environ["XLA_FLAGS"] = os.environ["BENCH_POST_XLA_FLAGS"]

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from open_groundingdino_tpu.models.bert import BertConfig
    from open_groundingdino_tpu.models.groundingdino import GroundingDINO
    from open_groundingdino_tpu.models.swin import SwinConfig

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        # batch sweep at the QB256 kernels (2026-08-19): B1 31.66 > B2
        # 30.46-30.91 > B3 30.0 > B4 30.25-30.33 > B6 29.7 > B8 28.1
        # img/s/chip — B=1 is the measured throughput optimum (and the
        # serving-latency configuration)
        B, H, W, T = int(os.environ.get("BENCH_BATCH", "1")), 800, 1216, 256
        iters, warmup = 40, 3
    else:  # CPU smoke fallback so the line always prints
        B, H, W, T = 1, 256, 320, 64
        iters, warmup = 2, 1

    model = GroundingDINO(
        swin_cfg=SwinConfig.from_name("swin_T_224_1k"),
        bert_cfg=BertConfig(),
        hidden_dim=256, num_queries=900, nheads=8, num_feature_levels=4,
        enc_layers=6, dec_layers=6, dim_feedforward=2048, max_text_len=T,
        msda_impl="auto",
    )

    rng = np.random.RandomState(0)
    ids = rng.randint(1000, 20000, size=(B, T)).astype(np.int32)
    ids[:, 0] = 101
    ids[:, min(120, T - 1)] = 102
    tmask = (np.arange(T)[None] < min(121, T)).repeat(B, 0)
    sam = np.tile(np.eye(T, dtype=bool)[None], (B, 1, 1))
    sam[:, 1 : min(120, T - 1), 1 : min(120, T - 1)] = True
    inputs = dict(
        images=rng.randn(B, H, W, 3).astype(np.float32),
        image_sizes=np.asarray([[H, W]] * B, np.int32),
        input_ids=ids,
        text_token_mask=tmask,
        position_ids=np.tile(np.arange(T, dtype=np.int32)[None], (B, 1)),
        text_self_attention_masks=sam,
    )

    params = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)

    # bf16 compute: cast params + images (master numerics stay in the
    # checkpoint; decoder FFN/heads force fp32 internally)
    if on_tpu:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params,
        )
        inputs["images"] = inputs["images"].astype(jnp.bfloat16)

    @jax.jit
    def fwd(variables, images, image_sizes, input_ids, text_token_mask,
            position_ids, text_self_attention_masks):
        out = model.apply(
            variables, images=images, image_sizes=image_sizes,
            input_ids=input_ids, text_token_mask=text_token_mask,
            position_ids=position_ids,
            text_self_attention_masks=text_self_attention_masks,
        )
        # scalar checksum: fetched to host as the timing fence
        # (block_until_ready does not reliably fence on the axon runtime)
        chk = jnp.sum(out["pred_boxes"].astype(jnp.float32))
        return out["pred_logits"], out["pred_boxes"], chk

    args = (
        params, jnp.asarray(inputs["images"]), jnp.asarray(inputs["image_sizes"]),
        jnp.asarray(inputs["input_ids"]), jnp.asarray(inputs["text_token_mask"]),
        jnp.asarray(inputs["position_ids"]),
        jnp.asarray(inputs["text_self_attention_masks"]),
    )

    # BENCH_SCAN=N: run N forwards inside ONE lax.scan dispatch, like the
    # train side's steps_per_call — the axon tunnel's per-execute overhead
    # (~wall-vs-device gap at these shapes) is dispatch transport, not
    # device time, and a single scan dispatch measures device throughput.
    # Every iteration's inputs are data-dependently perturbed (image += eps,
    # ids += (eps>1), both provably-unknowable to XLA) so no part of the
    # body can be hoisted out of the loop: each scan step runs the FULL
    # image+text forward.  0 = per-dispatch python loop.
    scan_n = int(os.environ.get("BENCH_SCAN", "0"))
    if scan_n:
        @jax.jit
        def fwd_scan(variables, images, image_sizes, input_ids,
                     text_token_mask, position_ids,
                     text_self_attention_masks, eps):
            def body(carry, e):
                off = (e > 1.0).astype(jnp.int32)  # 0 at runtime
                out = model.apply(
                    variables,
                    images=images + e.astype(images.dtype),
                    image_sizes=image_sizes,
                    input_ids=input_ids + off,
                    text_token_mask=text_token_mask,
                    position_ids=position_ids + off,
                    text_self_attention_masks=text_self_attention_masks,
                )
                chk = carry + jnp.sum(out["pred_boxes"].astype(jnp.float32))
                return chk, ()
            chk, _ = jax.lax.scan(body, jnp.float32(0.0), eps)
            return chk

        eps = jnp.linspace(0.0, 1e-3, scan_n, dtype=jnp.float32)
        sargs = args + (eps,)
        float(fwd_scan(*sargs))  # warmup (compile)
        t0 = time.perf_counter()
        float(fwd_scan(*sargs))  # host fetch fences the device queue
        dt = time.perf_counter() - t0
        ips = B * scan_n / dt
        print(json.dumps({
            "metric": "COCO val2017 images/sec/chip (Swin-T)",
            "value": round(ips, 3),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
        }))
        return

    for _ in range(warmup):
        out = fwd(*args)
    float(out[2])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(*args)
    float(out[2])  # host fetch fences the device queue
    dt = time.perf_counter() - t0

    ips = B * iters / dt
    print(
        json.dumps(
            {
                "metric": "COCO val2017 images/sec/chip (Swin-T)",
                "value": round(ips, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1" or \
            os.environ.get("BENCH_NO_SUPERVISE") == "1":
        main()
    else:
        sys.exit(_supervise())

#!/usr/bin/env python3
"""FLOPs / latency / FPS harness (reference tools/benchmark.py:607-665).

Instead of the reference's per-op jit-trace FLOP handlers (:46-560), FLOPs
come from XLA's own HLO cost analysis — exact for the compiled program —
plus wall-clock timing with warmup.  Writes JSON to output_dir/flops/log.txt.

    python tools/benchmark.py -c CONFIG -o out [--height 800 --width 1216]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--output_dir", "-o", default="bench_out")
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from open_groundingdino_tpu.config import SLConfig
    from open_groundingdino_tpu.models.groundingdino import build_groundingdino

    cfg = SLConfig.fromfile(args.config_file)
    model = build_groundingdino(cfg)

    B, H, W, T = args.batch, args.height, args.width, cfg.max_text_len
    rng = np.random.RandomState(0)
    ids = rng.randint(1000, 20000, size=(B, T)).astype(np.int32)
    ids[:, 0] = 101
    ids[:, 120] = 102
    inputs = dict(
        images=rng.randn(B, H, W, 3).astype(np.float32),
        image_sizes=np.asarray([[H, W]] * B, np.int32),
        input_ids=ids,
        text_token_mask=(np.arange(T)[None] < 121).repeat(B, 0),
        position_ids=np.tile(np.arange(T, dtype=np.int32)[None], (B, 1)),
        text_self_attention_masks=np.ones((B, T, T), bool),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    nparam = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )

    def fwd(variables, **inp):
        out = model.apply(variables, **inp)
        # scalar checksum fences timing (block_until_ready is unreliable
        # on the axon runtime)
        chk = jnp.sum(out["pred_boxes"].astype(jnp.float32))
        return out["pred_logits"], out["pred_boxes"], chk

    jitted = jax.jit(fwd)
    lowered = jitted.lower(params, **inputs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", -1)) if cost else -1.0

    jargs = {k: jnp.asarray(v) for k, v in inputs.items()}
    for _ in range(args.warmup):
        out = jitted(params, **jargs)
    float(out[2])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = jitted(params, **jargs)
    float(out[2])
    dt = (time.perf_counter() - t0) / args.iters

    result = {
        "nparam": nparam,
        "flops_per_forward": flops,
        "gflops": flops / 1e9 if flops > 0 else -1,
        "time_s": dt,
        "fps": args.batch / dt,
        "shape": [B, H, W],
        "platform": jax.devices()[0].platform,
    }
    out_dir = os.path.join(args.output_dir, "flops")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "log.txt"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

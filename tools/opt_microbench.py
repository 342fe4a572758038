#!/usr/bin/env python3
"""Optimizer-update microbenchmark: times ONE jitted
clip+AdamW+apply_updates pass over the flagship model's real parameter
tree (~170M params, ~400 leaves), isolated from the model fwd/bwd.

The train-step profile shows an XLA-fusion long tail (~7.9k fusions,
avg 20 us — BENCH_NOTES round-3); per-leaf optimizer lowering (3 ops/leaf
in safe_global_norm + per-leaf adamw chains) is a suspect.  This bench
sizes that share so a flat-per-group fused optimizer can be judged before
it is built.

Run on the real chip: python tools/opt_microbench.py [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--profile", default="",
                    help="directory: capture a device trace and print "
                         "per-op-bucket DEVICE time (robust to tunnel RTT)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from open_groundingdino_tpu.config.slconfig import SLConfig
    from open_groundingdino_tpu.models.groundingdino import (
        build_groundingdino,
    )
    from open_groundingdino_tpu.parallel.optim import make_optimizer

    cfg = SLConfig.fromfile(
        os.path.join(os.path.dirname(__file__), "..",
                     "open_groundingdino_tpu", "config", "cfg_coco.py"))
    model = build_groundingdino(cfg)
    B, H, W, T = 1, 256, 256, cfg.max_text_len
    nprng = np.random.RandomState(0)
    ids = np.ones((B, T), np.int32) * 5
    ids[:, 0] = 101
    inputs = dict(
        images=nprng.randn(B, H, W, 3).astype(np.float32),
        image_sizes=np.asarray([[H, W]] * B, np.int32),
        input_ids=ids,
        text_token_mask=np.ones((B, T), bool),
        position_ids=np.tile(np.arange(T, dtype=np.int32)[None], (B, 1)),
        text_self_attention_masks=np.ones((B, T, T), bool),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    leaves = len(jax.tree_util.tree_leaves(params))
    print(f"params: {n/1e6:.1f}M in {leaves} leaves")

    tx = make_optimizer(params, lr=1e-4, lr_backbone=1e-5,
                        clip_max_norm=0.1)
    opt_state = jax.jit(tx.init)(params)

    def step(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    jstep = jax.jit(step, donate_argnums=(0, 1))
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full(p.shape, 1e-6, p.dtype), params)

    p, s = jstep(params, opt_state, grads)
    np.asarray(jax.tree_util.tree_leaves(p)[0]).ravel()[:1]
    if args.profile:
        jax.profiler.start_trace(args.profile)
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            p, s = jstep(p, s, grads)
        np.asarray(jax.tree_util.tree_leaves(p)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / args.iters
        best = min(best, dt)
    if args.profile:
        jax.profiler.stop_trace()
        import importlib.util as _ilu
        _spec = _ilu.spec_from_file_location(
            "gdino_profile_tool",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "profile.py"))
        _mod = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_mod)
        _mod.summarize_trace(args.profile, args.repeats * args.iters,
                             top=15)
    print(f"optimizer update: {best*1e3:.2f} ms/step "
          f"(min of {args.repeats})")


if __name__ == "__main__":
    main()

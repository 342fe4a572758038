#!/usr/bin/env python3
"""Matcher microbenchmark (VERDICT r4 item 6 attribution): device time of
the stacked cost-matrix build vs the JV assignment at flagship train
shapes (S=7 output sets, B=4, Q=900, G=max_gt, T=256 — criterion.py:138-153),
isolated from the rest of the train step.

The Hungarian while-loop bucket measured 15.7 ms/step before the
masked/RR JV wins; the (S,B,Q,G) cost build is stock XLA and has never
been attributed separately.  This bench decides whether a fused
cost-matrix Pallas kernel can pay before one is built.

Run on the real chip:
  python tools/matcher_microbench.py [--iters 20] [--profile DIR]
Variants: --costs_only / --assign_only isolate the halves (the profile
bucket summary attributes them in one run too).
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
    ap.add_argument("--S", type=int, default=7)
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--Q", type=int, default=900)
    ap.add_argument("--G", type=int, default=128)
    ap.add_argument("--T", type=int, default=256)
    ap.add_argument("--n_real_gt", type=int, default=24,
                    help="valid GT per image (rest padded invalid)")
    ap.add_argument("--costs_only", action="store_true")
    ap.add_argument("--assign_only", action="store_true")
    ap.add_argument("--profile", default="")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from open_groundingdino_tpu.models.matcher import (
        compute_cost_matrix, hungarian_assign,
    )

    S, B, Q, G, T = args.S, args.B, args.Q, args.G, args.T
    rng = np.random.RandomState(0)
    logits = rng.randn(S, B, Q, T).astype(np.float32) - 3.0
    boxes = rng.uniform(0.2, 0.8, (S, B, Q, 4)).astype(np.float32)
    gt_boxes = rng.uniform(0.3, 0.7, (B, G, 4)).astype(np.float32) \
        * np.asarray([1, 1, 0.3, 0.3], np.float32)
    pos_maps = np.zeros((B, G, T), np.float32)
    for b in range(B):
        for g in range(G):
            a = rng.randint(1, T - 4)
            pos_maps[b, g, a : a + 3] = 1.0
    gt_valid = np.zeros((B, G), bool)
    gt_valid[:, : args.n_real_gt] = True

    def build_costs(lg, bx, gtb, gpm, gv):
        return jnp.stack([
            compute_cost_matrix(lg[s], bx[s], gtb, gpm, gv)
            for s in range(S)
        ])

    def full(lg, bx, gtb, gpm, gv):
        costs = build_costs(lg, bx, gtb, gpm, gv)
        idx = hungarian_assign(
            costs.reshape(S * B, Q, G), jnp.tile(gv, (S, 1))
        )
        return idx.reshape(S, B, G).sum()

    def costs_only(lg, bx, gtb, gpm, gv):
        return build_costs(lg, bx, gtb, gpm, gv).sum()

    if args.costs_only:
        fn, label = costs_only, "cost build"
    elif args.assign_only:
        costs = jax.jit(build_costs)(logits, boxes, gt_boxes, pos_maps,
                                     gt_valid)
        costs = np.asarray(costs)

        def assign_only(c, gv):
            return hungarian_assign(
                c.reshape(S * B, Q, G), jnp.tile(gv, (S, 1))
            ).sum()

        jfn = jax.jit(assign_only)
        arrs = (costs, gt_valid)
        fn, label = None, "assign"
    else:
        fn, label = full, "cost build + assign"

    if fn is not None:
        jfn = jax.jit(fn)
        arrs = (logits, boxes, gt_boxes, pos_maps, gt_valid)

    # upload operands ONCE: passing numpy per call re-ships ~26 MB of
    # logits through the tunnel every iteration (wall-dominating; the
    # 2026-08-20 run measured 515 ms wall vs ~8 ms device because of it)
    arrs = tuple(jax.device_put(jnp.asarray(a)) for a in arrs)
    out = jfn(*arrs)
    float(out)  # compile + fence (block_until_ready unreliable on axon)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(*arrs)
        float(out)
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
    print(f"{label} (S={S} B={B} Q={Q} G={G} T={T}): "
          f"{best*1e3:.2f} ms (min of {args.repeats})")


if __name__ == "__main__":
    main()

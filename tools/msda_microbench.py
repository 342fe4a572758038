#!/usr/bin/env python3
"""MSDA kernel microbenchmark: one encoder layer's deformable attention at
bench shapes (B=4, 800x1216 bucket -> 20197 queries, 4 levels, 8 heads,
P=4), trained-like offset spread.  Times the Pallas forward against the
XLA reference path; use to evaluate kernel variants without a full
bench.py cycle.

Run on the real chip: python tools/msda_microbench.py [--xla] [--bwd]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xla", action="store_true", help="also time XLA path")
    ap.add_argument("--sweep", action="store_true",
                    help="also time the legacy sweep kernel "
                         "(ops/msda_pallas.py); the banded family "
                         "(the production default) is always timed")
    ap.add_argument("--bwd", action="store_true", help="time fwd+bwd")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--spread", type=float, default=1.0,
                    help="multiplier on the reference-style grid-bias "
                         "offsets (1.0 = init; >1 = trained-like widening)")
    ap.add_argument("--jitter", type=float, default=0.5,
                    help="per-query random jitter in cells on top of the "
                         "grid bias (trained nets have modest per-query "
                         "variation)")
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                    help="value/output dtype (bf16 = the e2e mixed-"
                         "precision path)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timing repeats; reports the min (axon timing "
                         "has high run-to-run variance)")
    ap.add_argument("--profile", default="",
                    help="directory: capture a device trace around the "
                         "timed loops and print per-op-bucket DEVICE time "
                         "(robust against axon-tunnel RTT degradation, "
                         "which inflates wall-clock mins 2x+ on bad days)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from open_groundingdino_tpu.ops.msda import ms_deform_attn_xla
    from open_groundingdino_tpu.ops.msda_pallas import ms_deform_attn_pallas

    B, H, D, P = 4, 8, 32, 4
    # 800x1216 bucket -> swin strides 8/16/32/64
    shapes = ((100, 152), (50, 76), (25, 38), (13, 19))
    L = sum(h * w for h, w in shapes)
    Q = L  # encoder self-attention
    rng = np.random.RandomState(0)

    value = rng.randn(B, L, H, D).astype(np.float32)
    # reference points: each query at its own spatial location per level,
    # offsets ~ spread pixels of the query's own level
    ref = []
    for (h, w) in shapes:
        ys, xs = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij")
        ref.append(np.stack([xs, ys], -1).reshape(-1, 2))
    ref = np.concatenate(ref, 0)  # (L, 2) normalized
    # reference init (deformable_transformer.py grid_init): per-head unit
    # ray scaled by point index, shared across queries; plus modest
    # per-query jitter to model a trained state
    theta = np.arange(H) * (2 * np.pi / H)
    grid = np.stack([np.cos(theta), np.sin(theta)], -1)  # (H, 2)
    grid /= np.abs(grid).max(-1, keepdims=True)
    bias = grid[:, None, :] * (np.arange(P) + 1)[None, :, None]  # (H, P, 2)
    bias = np.tile(bias[:, None], (1, len(shapes), 1, 1))  # (H, NL, P, 2)
    offs = (
        bias[None, None] * args.spread
        + rng.randn(B, Q, H, len(shapes), P, 2) * args.jitter
    ).astype(np.float32)
    wh = np.asarray([[w, h] for h, w in shapes], np.float32)  # (NL, 2)
    locs = ref[None, :, None, None, None, :] + (
        offs / wh[None, None, None, :, None, :]
    )
    attn = rng.rand(B, Q, H, len(shapes), P).astype(np.float32)
    attn /= attn.sum(axis=(3, 4), keepdims=True)

    # match the encoder's interleaved query ordering (queries permuted,
    # value stays raster — see models/transformer.py DeformableEncoder)
    from open_groundingdino_tpu.models.transformer import (
        _interleaved_query_order,
    )
    perm = _interleaved_query_order(shapes)
    locs = locs[:, perm]
    attn = attn[:, perm]

    vdtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    value_j = jnp.asarray(value).astype(vdtype)
    locs_j = jnp.asarray(locs.astype(np.float32)).astype(vdtype)
    attn_j = jnp.asarray(attn).astype(vdtype)

    def time_fn(name, f, *a):
        jf = jax.jit(f)
        out = jf(*a)
        first = out[0] if isinstance(out, tuple) else out
        np.asarray(jax.tree_util.tree_leaves(first)[0]).ravel()[:1]
        prof_dir = ""
        if args.profile:
            prof_dir = os.path.join(args.profile,
                                    name.replace(" ", "_").replace("+", "_"))
            jax.profiler.start_trace(prof_dir)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = jf(*a)
            first = out[0] if isinstance(out, tuple) else out
            np.asarray(jax.tree_util.tree_leaves(first)[0]).ravel()[:1]
            dt = (time.perf_counter() - t0) / args.iters
            best = min(best, dt)
        if prof_dir:
            jax.profiler.stop_trace()
            import importlib.util as _ilu
            _spec = _ilu.spec_from_file_location(
                "gdino_profile_tool",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "profile.py"))
            _mod = _ilu.module_from_spec(_spec)
            _spec.loader.exec_module(_mod)
            summarize_trace = _mod.summarize_trace
            print(f"--- device-time summary [{name}] "
                  f"({args.repeats * args.iters} executions):")
            summarize_trace(prof_dir, args.repeats * args.iters, top=12)
        print(f"{name}: {best*1e3:.1f} ms/layer (min of {args.repeats})")
        return out

    # ---- banded kernel family (the production default since round 3):
    # kernel-layout operands exactly as models/deformable.py emits them
    from open_groundingdino_tpu.ops.msda_banded import ms_deform_attn_banded

    BH = B * H
    v_bhdl = value.transpose(0, 2, 3, 1).reshape(BH, D, L)  # (BH, D, L)
    banded_vals, start = [], 0
    for (h, w) in shapes:
        vl = v_bhdl[:, :, start : start + h * w].reshape(BH, D, h, w)
        banded_vals.append(jnp.asarray(np.ascontiguousarray(
            vl.transpose(0, 2, 1, 3).reshape(BH, h * D, w)
        )).astype(vdtype))
        start += h * w
    banded_vals = tuple(banded_vals)
    locs_t = jnp.asarray(np.ascontiguousarray(
        locs.astype(np.float32).transpose(0, 2, 3, 4, 5, 1)
        .reshape(BH, len(shapes), P, 2, Q)
    ))
    attn_t = jnp.asarray(np.ascontiguousarray(
        attn.astype(np.float32).transpose(0, 2, 3, 4, 1)
        .reshape(BH, len(shapes), P, Q)
    )).astype(vdtype)

    def banded_fwd(vs, l, a):
        return ms_deform_attn_banded(vs, shapes, l, a, P)

    o_b = time_fn("banded fwd", banded_fwd, banded_vals, locs_t, attn_t)

    if args.bwd:
        def loss_b(vs, l, a):
            return jnp.sum(
                ms_deform_attn_banded(vs, shapes, l, a, P) ** 2)
        time_fn("banded fwd+bwd", jax.grad(loss_b, argnums=(0, 1, 2)),
                banded_vals, locs_t, attn_t)

    if args.sweep:
        def pallas_fwd(v, l, a):
            return ms_deform_attn_pallas(v, shapes, l, a)

        time_fn("sweep fwd", pallas_fwd, value_j, locs_j, attn_j)

        if args.bwd:
            def loss_p(v, l, a):
                return jnp.sum(ms_deform_attn_pallas(v, shapes, l, a) ** 2)
            time_fn("sweep fwd+bwd", jax.grad(loss_p, argnums=(0, 1, 2)),
                    value_j, locs_j, attn_j)

    if args.xla:
        def xla_fwd(v, l, a):
            return ms_deform_attn_xla(v, shapes, l, a)
        o_x = time_fn("xla fwd", xla_fwd, value_j, locs_j, attn_j)
        o_x_t = jnp.transpose(o_x, (0, 2, 3, 1)).reshape(B * H, D, Q)
        err = float(jnp.max(jnp.abs(o_b - o_x_t)))
        print(f"max abs diff banded vs xla: {err:.2e}")


if __name__ == "__main__":
    main()

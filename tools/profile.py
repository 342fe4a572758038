#!/usr/bin/env python3
"""Profiler trace capture (the TPU-native analog of the reference's
tools/benchmark.py timing harness; SURVEY.md section 5.1).

    python tools/profile.py -c CONFIG -o trace_dir [--height 800 --width 1216]

Writes a jax.profiler trace (xplane) viewable in TensorBoard/Perfetto.  On
runtimes without profiling support the run still reports wall-clock timing.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--output_dir", "-o", default="trace_out")
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="bfloat16 matches the bench.py path")
    ap.add_argument("--train", action="store_true",
                    help="trace the full train step instead of the forward")
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
    ids[:, 0], ids[:, min(120, T - 1)] = 101, 102
    inputs = dict(
        images=rng.randn(B, H, W, 3).astype(np.float32),
        image_sizes=np.asarray([[H, W]] * B, np.int32),
        input_ids=ids,
        text_token_mask=(np.arange(T)[None] < min(121, T)).repeat(B, 0),
        position_ids=np.tile(np.arange(T, dtype=np.int32)[None], (B, 1)),
        text_self_attention_masks=np.ones((B, T, T), bool),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)

    if args.train:
        from open_groundingdino_tpu.models.criterion import SetCriterion
        from open_groundingdino_tpu.parallel.optim import make_optimizer
        from open_groundingdino_tpu.parallel.train_state import (
            TrainState, make_train_step,
        )

        G = int(getattr(cfg, "max_gt_boxes", 128))
        n_real = 8
        gt_valid = (np.arange(G)[None] < n_real).repeat(B, 0)
        gt_boxes = np.concatenate(
            [rng.uniform(0.2, 0.8, (B, G, 2)),
             rng.uniform(0.05, 0.3, (B, G, 2))], -1).astype(np.float32)
        gt_pos_maps = np.zeros((B, G, T), np.float32)
        gt_pos_maps[:, :, 1:8] = 1.0
        batch = {k: jnp.asarray(v) for k, v in dict(
            inputs, gt_boxes=gt_boxes, gt_pos_maps=gt_pos_maps,
            gt_valid=gt_valid).items()}
        crit = SetCriterion(
            num_queries=cfg.num_queries, cost_class=cfg.set_cost_class,
            cost_bbox=cfg.set_cost_bbox, cost_giou=cfg.set_cost_giou,
            cls_loss_coef=cfg.cls_loss_coef,
            bbox_loss_coef=cfg.bbox_loss_coef,
            giou_loss_coef=cfg.giou_loss_coef,
            focal_alpha=cfg.focal_alpha,
        )
        tx = make_optimizer(
            params["params"], lr=float(cfg.lr),
            lr_backbone=float(cfg.lr_backbone),
        )
        state = TrainState.create(params["params"], tx)
        cdt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else None
        step_fn = jax.jit(make_train_step(model, crit, compute_dtype=cdt))
        state, m = step_fn(state, batch)
        float(m["loss"])
        os.makedirs(args.output_dir, exist_ok=True)
        try:
            with jax.profiler.trace(args.output_dir):
                for _ in range(args.iters):
                    state, m = step_fn(state, batch)
                float(m["loss"])
            print(f"train trace -> {args.output_dir}")
        except Exception as e:
            print(f"trace unavailable: {e}")
        else:
            _summarize_safely(args.output_dir, args.iters)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step_fn(state, batch)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"train: {dt*1e3:.1f} ms/step ({args.batch/dt:.2f} img/s)")
        return

    if args.compute_dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params,
        )
        inputs["images"] = inputs["images"].astype(jnp.bfloat16)

    @jax.jit
    def fwd(v, **kw):
        out = model.apply(v, **kw)
        return jnp.sum(out["pred_boxes"].astype(jnp.float32))

    jargs = {k: jnp.asarray(v) for k, v in inputs.items()}
    float(fwd(params, **jargs))  # warm + compile

    os.makedirs(args.output_dir, exist_ok=True)
    traced = False
    try:
        with jax.profiler.trace(args.output_dir):
            for _ in range(args.iters):
                o = fwd(params, **jargs)
            float(o)
        traced = True
    except Exception as e:  # profiling unsupported on some runtimes (axon)
        print(f"profiler trace unavailable ({type(e).__name__}: {e}); "
              "falling back to wall clock")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        o = fwd(params, **jargs)
    float(o)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"fwd: {dt * 1e3:.1f} ms/batch  ({args.batch / dt:.2f} img/s)"
          + (f"; trace -> {args.output_dir}" if traced else ""))
    if traced:
        _summarize_safely(args.output_dir, args.iters)


def _summarize_safely(trace_dir: str, iters: int) -> None:
    """A truncated/malformed trace (killed mid-write, disk full) must not
    crash the tool after the timing line already printed."""
    try:
        summarize_trace(trace_dir, iters)
    except Exception as e:
        print(f"trace written but summary failed: {e}")


def summarize_trace(trace_dir: str, iters: int, top: int = 30) -> None:
    """Print per-op-bucket device time from the written trace (the
    round-to-round attribution table BENCH_NOTES records; replaces the
    ad-hoc trace parsing of earlier rounds).  Buckets are trace event
    names truncated at the first '.' — XLA fusions, custom-call kernels
    (pallas module names like self_attn/cross_attn/attn), copies, convs
    land in separate rows.  Times are totals per iteration; parent spans
    (the jit_* row) include their children."""
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    ))
    if not paths:
        print("no trace.json.gz found to summarize")
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    durs: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    bypid: collections.Counter = collections.Counter()
    pid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid", 0)] = e.get("args", {}).get("name", "")
        if e.get("ph") != "X":
            continue
        key = (e.get("pid", 0), e.get("name", "").split(".")[0][:60])
        d = e.get("dur", 0)
        durs[key] += d
        counts[key] += 1
        bypid[e.get("pid", 0)] += d
    if not bypid:
        print("trace has no complete events")
        return
    # the device timeline carries a '/device:' process name; fall back to
    # the busiest pid if metadata is absent
    dev_pids = [p for p, n in pid_names.items() if "/device:" in (n or "")]
    dev = (max(dev_pids, key=lambda p: bypid.get(p, 0)) if dev_pids
           else bypid.most_common(1)[0][0])
    rows = sorted(
        ((d, name, counts[(pid, name)]) for (pid, name), d in durs.items()
         if pid == dev),
        reverse=True,
    )
    total = sum(r[0] for r in rows)
    print(f"device self-time {total / 1e3 / max(iters, 1):.1f} ms/iter "
          f"across {len(rows)} buckets (top {top}):")
    for d, name, c in rows[:top]:
        print(f"  {d / 1e3 / max(iters, 1):8.2f} ms  x{c:5d}  {name}")


if __name__ == "__main__":
    main()

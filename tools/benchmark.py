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


def _bench_train(args, cfg, model, params, inputs, compute_dtype, nparam):
    """Time the full training step: forward, on-device Hungarian matching,
    criterion, backward, grad clip, AdamW (the reference's engine step,
    engine_multi.py:353-593, fused into one jitted program).  Writes the
    same log.txt shape with step time and imgs/sec."""
    import jax
    import jax.numpy as jnp

    from open_groundingdino_tpu.models.criterion import SetCriterion
    from open_groundingdino_tpu.parallel.optim import make_optimizer
    from open_groundingdino_tpu.parallel.train_state import (
        TrainState, make_train_step,
    )

    B = args.batch
    T = cfg.max_text_len
    G = int(getattr(cfg, "max_gt_boxes", 128))
    rng = np.random.RandomState(1)

    # synthetic padded GT: ~8 real boxes per image, token span [1, 8)
    n_real = 8
    gt_valid = (np.arange(G)[None] < n_real).repeat(B, 0)
    cxcy = rng.uniform(0.2, 0.8, size=(B, G, 2))
    wh = rng.uniform(0.05, 0.3, size=(B, G, 2))
    gt_boxes = np.concatenate([cxcy, wh], -1).astype(np.float32)
    gt_pos_maps = np.zeros((B, G, T), np.float32)
    gt_pos_maps[:, :, 1:8] = 1.0
    batch = dict(
        inputs,
        gt_boxes=gt_boxes,
        gt_pos_maps=gt_pos_maps,
        gt_valid=gt_valid,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    crit = SetCriterion(
        num_queries=cfg.num_queries,
        cost_class=cfg.set_cost_class, cost_bbox=cfg.set_cost_bbox,
        cost_giou=cfg.set_cost_giou, cls_loss_coef=cfg.cls_loss_coef,
        bbox_loss_coef=cfg.bbox_loss_coef, giou_loss_coef=cfg.giou_loss_coef,
        interm_loss_coef=getattr(cfg, "interm_loss_coef", 1.0),
        focal_alpha=cfg.focal_alpha,
        focal_gamma=getattr(cfg, "focal_gamma", 2.0),
        matcher_type=str(getattr(cfg, "matcher_type", "HungarianMatcher")),
    )
    tx = make_optimizer(
        params["params"], lr=float(cfg.lr), lr_backbone=float(cfg.lr_backbone),
        lr_linear_proj_mult=float(getattr(cfg, "lr_linear_proj_mult", 0.1)),
        weight_decay=float(cfg.weight_decay),
        clip_max_norm=float(cfg.clip_max_norm),
    )
    state = TrainState.create(params["params"], tx)
    spc = max(args.steps_per_call, 1)
    if spc > 1:
        from open_groundingdino_tpu.parallel.train_state import (
            make_multi_train_step,
        )
        step_fn = jax.jit(
            make_multi_train_step(model, crit, spc,
                                  compute_dtype=compute_dtype),
            donate_argnums=(0,),
        )
        batch = {k: jnp.broadcast_to(v, (spc,) + v.shape)
                 for k, v in batch.items()}
    else:
        step_fn = jax.jit(
            make_train_step(model, crit, compute_dtype=compute_dtype),
            donate_argnums=(0,),
        )

    curve = []
    for _ in range(max(args.warmup, 1)):
        state, metrics = step_fn(state, batch)
        if args.loss_curve:
            curve.extend(np.asarray(metrics["loss"]).reshape(-1).tolist())
    jax.tree_util.tree_map(
        lambda x: np.asarray(x), metrics
    )  # host fetch fences the device queue (axon)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step_fn(state, batch)
        if args.loss_curve:
            curve.extend(np.asarray(metrics["loss"]).reshape(-1).tolist())
    loss_last = np.asarray(metrics["loss"]).reshape(-1)[-1]
    dt = (time.perf_counter() - t0) / (args.iters * spc)

    result = {
        "mode": "train",
        "nparam": nparam,
        "compute_dtype": "bfloat16" if compute_dtype is not None else "float32",
        "step_time_s": dt,
        "steps_per_call": spc,
        "imgs_per_sec": B / dt,
        "loss": float(loss_last),
        "shape": [B, args.height, args.width],
        "platform": jax.devices()[0].platform,
    }
    if args.loss_curve:
        # per-step loss trajectory at fixed inputs (numerics A/Bs, e.g. the
        # MSDA_BWD_GV_BF16 candidate — VERDICT r4 item 7; timing is tainted
        # by the per-step host fetch, so ignore step_time_s on such runs)
        result["loss_curve"] = [round(x, 4) for x in curve]
    out_dir = os.path.join(args.output_dir, "flops")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "log.txt"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--output_dir", "-o", default="bench_out")
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--steps_per_call", type=int, default=1,
                    help="train mode: optimizer steps per device dispatch "
                         "(lax.scan over a stacked batch; amortizes "
                         "per-execute host overhead)")
    ap.add_argument("--loss_curve", action="store_true",
                    help="(train) fetch + report per-step losses at fixed "
                         "inputs; taints timing (one host fetch per step)")
    ap.add_argument("--train", action="store_true",
                    help="time the full train step (fwd + on-device "
                         "Hungarian + bwd + clip + AdamW) instead of the "
                         "forward — tracks training throughput per round")
    ap.add_argument("--compute_dtype", default=None,
                    choices=[None, "bfloat16", "float32"],
                    help="override cfg compute dtype for the timed step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from open_groundingdino_tpu.config import SLConfig
    from open_groundingdino_tpu.models.groundingdino import build_groundingdino

    cfg = SLConfig.fromfile(args.config_file)
    model = build_groundingdino(cfg)

    B, H, W, T = args.batch, args.height, args.width, cfg.max_text_len
    rng = np.random.RandomState(0)
    vocab = int(getattr(cfg, "bert_vocab_size", 30522))
    ids = rng.randint(min(1000, vocab - 1), min(20000, vocab),
                      size=(B, T)).astype(np.int32)
    ids[:, 0] = min(101, vocab - 1)          # [CLS] (101 in the real vocab)
    ids[:, min(120, T - 1)] = min(102, vocab - 1)  # [SEP]
    inputs = dict(
        images=rng.randn(B, H, W, 3).astype(np.float32),
        image_sizes=np.asarray([[H, W]] * B, np.int32),
        input_ids=ids,
        text_token_mask=(np.arange(T)[None] < min(121, T)).repeat(B, 0),
        position_ids=np.tile(np.arange(T, dtype=np.int32)[None], (B, 1)),
        text_self_attention_masks=np.ones((B, T, T), bool),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    nparam = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )

    dtype_name = args.compute_dtype or str(
        getattr(cfg, "compute_dtype", "float32"))
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None

    if args.train:
        _bench_train(args, cfg, model, params, inputs, compute_dtype, nparam)
        return

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
    if args.warmup:
        float(out[2])  # fence warmup before the timed loop
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

#!/usr/bin/env python
"""End-to-end EVAL-PIPELINE throughput (VERDICT r3 item 5).

Measures the full eval surface the reference exposes
(/root/reference/engine_multi.py:596-949): JPEG decode + resize (host
threads) -> Collator bucket-pad + tokenize -> jitted forward ->
PostProcess (device top-k + host NMS) -> CocoBboxEvaluator — on
synthetic COCO-sized data with the real 80-category caption — and prints
pipeline img/s next to the raw jitted-forward img/s on the same batch
shape, so the overlap claim ("host work hides behind device dispatch",
engine.evaluate_coco's 1-deep software pipeline) is a measured number,
not an assumption.

  python tools/eval_pipeline_bench.py                     # flagship (chip)
  python tools/eval_pipeline_bench.py --nano --images 8   # CPU smoke

Output: ONE JSON line {"pipeline_img_s":..., "raw_fwd_img_s":...,
"ratio":..., ...}.  ratio >= ~0.9 means the pipeline is device-bound.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

COCO_CATS = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
]


def make_vocab(cats):
    """Minimal WordPiece vocab covering the caption built from `cats`."""
    words = set()
    for c in cats:
        words.update(c.lower().split())
    return (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "."]
            + sorted(words))


def build_workspace(root, n_images, size_hw, cats, seed=0):
    """Synthetic COCO val: real JPEG files (decode cost is real), random
    boxes, category ids cycling through the list."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    H, W = size_hw
    images, anns = [], []
    for i in range(n_images):
        arr = rng.randint(0, 255, (H, W, 3), np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "images", f"img_{i}.jpg"), quality=90
        )
        images.append({"id": i, "file_name": f"images/img_{i}.jpg",
                       "width": W, "height": H})
        for j in range(4):
            x, y = rng.randint(0, W // 2), rng.randint(0, H // 2)
            w, h = rng.randint(20, W // 2), rng.randint(20, H // 2)
            anns.append({"id": len(anns) + 1, "image_id": i,
                         "category_id": (i * 4 + j) % len(cats) + 1,
                         "bbox": [int(x), int(y), int(w), int(h)],
                         "area": int(w * h), "iscrowd": 0})
    coco = {
        "images": images,
        "categories": [
            {"id": i + 1, "name": c} for i, c in enumerate(cats)
        ],
        "annotations": anns,
    }
    with open(os.path.join(root, "coco.json"), "w") as f:
        json.dump(coco, f)
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        f.write("\n".join(make_vocab(cats)) + "\n")
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "open_groundingdino_tpu", "config", "cfg_coco.py"))
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--img_size", default="750x1000",
                    help="source HxW; eval resize maps it into a bucket")
    ap.add_argument("--nano", action="store_true",
                    help="nano model + tiny images (CPU smoke)")
    ap.add_argument("--workspace", default=None)
    ap.add_argument("--fwd_iters", type=int, default=10)
    ap.add_argument("--u8", action="store_true",
                    help="ship uint8 images, normalize on device (3 B/px "
                         "host->device instead of 12)")
    ap.add_argument("--device_resident", action="store_true",
                    help="pre-upload every batch to the device before "
                         "timing (VERDICT r4 item 5): measures the "
                         "pipeline's non-transfer ceiling — what a host "
                         "feeding via local PCIe would see")
    args_cli = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from open_groundingdino_tpu.config.slconfig import SLConfig
    from open_groundingdino_tpu.data.loader import Collator, DataLoader
    from open_groundingdino_tpu.data.tokenization import (
        BertWordPieceTokenizer,
    )
    from open_groundingdino_tpu.engine import evaluate_coco
    from open_groundingdino_tpu.models.groundingdino import (
        build_groundingdino,
    )
    from open_groundingdino_tpu.models.postprocess import PostProcess
    from open_groundingdino_tpu.parallel.mesh import (
        make_mesh, replicate_tree, shard_batch,
    )
    from open_groundingdino_tpu.parallel.train_state import make_eval_step
    import jax.numpy as jnp
    import main as main_mod

    cfg = SLConfig.fromfile(args_cli.config)
    args = cfg.as_namespace() if hasattr(cfg, "as_namespace") else cfg
    cats = COCO_CATS
    if args_cli.nano:
        for k, v in dict(
            backbone="swin_nano_test", hidden_dim=32, nheads=4, enc_layers=1,
            dec_layers=2, dim_feedforward=64, num_queries=12,
            max_text_len=48, bert_vocab_size=256, bert_hidden_size=32,
            bert_layers=1, bert_heads=4, bert_intermediate=32,
            num_select=10, use_checkpoint=False, use_transformer_ckpt=False,
            image_buckets=[(64, 96), (96, 96)], eval_shortest_edge=64,
            eval_max_size=96,
        ).items():
            setattr(args, k, v)
        cats = COCO_CATS[:6]
        args_cli.img_size = "80x110"

    H, W = (int(x) for x in args_cli.img_size.split("x"))
    ws = args_cli.workspace or tempfile.mkdtemp(prefix="evalbench_")
    build_workspace(ws, args_cli.images, (H, W), cats)
    manifest = {"val": [{"root": ws, "anno": os.path.join(ws, "coco.json"),
                         "dataset_mode": "coco"}]}

    tokenizer = BertWordPieceTokenizer(os.path.join(ws, "vocab.txt"))
    val_dataset = main_mod.build_datasets(manifest, "val", args, tokenizer)
    collator = Collator(
        tokenizer, args.image_buckets, max_text_len=args.max_text_len,
        max_gt=int(getattr(args, "max_gt_boxes", 128)),
        u8_images=args_cli.u8,
    )
    model = build_groundingdino(args)
    mesh = make_mesh(jax.devices()[:1])
    loader = DataLoader(val_dataset, collator, batch_size=args_cli.batch)

    # init params off the first batch's shapes
    first = next(iter(loader))
    init_inputs = {
        k: first[k]
        for k in ("images", "image_sizes", "input_ids", "text_token_mask",
                  "position_ids", "text_self_attention_masks")
    }
    if init_inputs["images"].dtype == np.uint8:  # u8 mode: init on floats
        init_inputs = dict(
            init_inputs, images=init_inputs["images"].astype(np.float32)
        )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), **init_inputs)["params"]
    params = replicate_tree(params, mesh)

    compute_dtype = {
        "bfloat16": jnp.bfloat16, "float32": None, "fp32": None,
    }.get(str(getattr(args, "compute_dtype", "bfloat16")), jnp.bfloat16)
    eval_step = jax.jit(make_eval_step(model, compute_dtype=compute_dtype))
    postprocessor = PostProcess(
        tokenizer, list(val_dataset.cat_list), num_select=args.num_select,
        max_text_len=args.max_text_len,
        nms_iou_threshold=args.nms_iou_threshold,
    )

    # ---- raw forward (bench.py protocol: host-fetch fence per iter) ----
    sharded = shard_batch(first, mesh)
    out = eval_step(params, sharded)
    np.asarray(out["pred_boxes"])  # compile + settle
    if os.environ.get("EVAL_PRECAST", "0") == "1" and compute_dtype is not None:
        # warm the bf16-param eval program OUTSIDE the timed pipeline
        # (evaluate_coco's internal precast would otherwise compile it
        # inside the measurement window — the 2026-08-20 phase-C runs
        # were compile-tainted exactly this way)
        from open_groundingdino_tpu.parallel.train_state import cast_floating

        warm = jax.jit(lambda p: cast_floating(p, compute_dtype))(params)
        out = eval_step(warm, sharded)
        np.asarray(out["pred_boxes"])
    t0 = time.perf_counter()
    for _ in range(args_cli.fwd_iters):
        out = eval_step(params, sharded)
        np.asarray(out["pred_boxes"])
    raw_dt = (time.perf_counter() - t0) / args_cli.fwd_iters
    raw_ips = args_cli.batch / raw_dt

    # ---- full pipeline (fresh loader; includes decode/collate/post/eval)
    loader2 = DataLoader(val_dataset, collator, batch_size=args_cli.batch)
    if args_cli.device_resident:
        # pre-upload every batch: decode+collate+transfer happen BEFORE the
        # clock starts; shard_batch inside evaluate_coco no-ops on the
        # already-placed arrays, so the timed loop is dispatch + device
        # compute + host postprocess/evaluator only
        staged = []
        for b in loader2:
            db = dict(b)
            db.update(shard_batch(b, mesh))
            staged.append(db)
        for a in jax.tree_util.tree_leaves(
            [v for d in staged for k, v in d.items()
             if isinstance(v, jax.Array)]
        ):
            a.block_until_ready()
        loader2 = staged
    t0 = time.perf_counter()
    evaluate_coco(
        eval_step, params, loader2, mesh, postprocessor, val_dataset.coco,
        val_dataset.contiguous_to_catid, logger=None,
        precast_dtype=compute_dtype,
    )
    pipe_dt = time.perf_counter() - t0
    pipe_ips = args_cli.images / pipe_dt

    print(json.dumps({
        "metric": "eval pipeline images/sec/chip (Swin-T)"
        if not args_cli.nano else "eval pipeline images/sec (nano, cpu)",
        "pipeline_img_s": round(pipe_ips, 3),
        "raw_fwd_img_s": round(raw_ips, 3),
        "ratio": round(pipe_ips / raw_ips, 3),
        "images": args_cli.images,
        "batch": args_cli.batch,
        "device_resident": bool(args_cli.device_resident),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""AOT SERVING latency benchmark (BENCH_NOTES round-5 lever 3).

Exports the flagship model as a jax.export serving artifact (serving.py),
reloads it the way a serving process would, and measures the AOT call's
per-dispatch latency on a device-resident batch — the deployment-facing
number next to bench.py's jit throughput.  The reference has no AOT
path at all (its deployment surface is eager PyTorch,
/root/reference/tools/inference_on_a_image.py).

  python tools/serving_bench.py                # flagship, chip
  python tools/serving_bench.py --nano         # CPU smoke

Prints ONE JSON line {"aot_latency_ms":..., "aot_img_s":..., ...}.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "open_groundingdino_tpu", "config", "cfg_coco.py"))
    ap.add_argument("--bucket", default="800x1216")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--nano", action="store_true")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from open_groundingdino_tpu.config.slconfig import SLConfig
    from open_groundingdino_tpu.data.tokenization import (
        BertWordPieceTokenizer,
    )
    from open_groundingdino_tpu.data.transforms import Bucketer
    from open_groundingdino_tpu.inference import InferenceModel
    from open_groundingdino_tpu.models.groundingdino import (
        build_groundingdino,
    )
    from open_groundingdino_tpu.serving import export_model, load_exported

    cfg = SLConfig.fromfile(args_cli.config)
    args = cfg.as_namespace() if hasattr(cfg, "as_namespace") else cfg
    if args_cli.nano:
        for k, v in dict(
            backbone="swin_nano_test", hidden_dim=32, nheads=4, enc_layers=1,
            dec_layers=2, dim_feedforward=64, num_queries=12,
            max_text_len=24, bert_vocab_size=32, bert_hidden_size=32,
            bert_layers=1, bert_heads=4, bert_intermediate=32,
            use_checkpoint=False, use_transformer_ckpt=False,
        ).items():
            setattr(args, k, v)
        args_cli.bucket = "64x96"

    H, W = (int(x) for x in args_cli.bucket.split("x"))
    B, T = args_cli.batch, int(args.max_text_len)
    model = build_groundingdino(args)

    rng = np.random.RandomState(0)
    ids = rng.randint(5, 30, size=(B, T)).astype(np.int32)
    inputs = (
        rng.randn(B, H, W, 3).astype(np.float32),
        np.asarray([[H, W]] * B, np.int32),
        ids,
        np.ones((B, T), bool),
        np.tile(np.arange(T, dtype=np.int32)[None], (B, 1)),
        np.ones((B, T, T), bool),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), images=inputs[0], image_sizes=inputs[1],
        input_ids=inputs[2], text_token_mask=inputs[3],
        position_ids=inputs[4], text_self_attention_masks=inputs[5],
    )["params"]

    vocab_file = tempfile.NamedTemporaryFile(
        "w", suffix=".txt", delete=False
    )
    vocab_file.write("\n".join(
        "[PAD] [UNK] [CLS] [SEP] [MASK] .".split()
        + [f"tok{i}" for i in range(64)]
    ) + "\n")
    vocab_file.close()
    im = InferenceModel(
        model=model, params=params,
        tokenizer=BertWordPieceTokenizer(vocab_file.name),
        args=args, bucketer=Bucketer([(H, W)]), max_text_len=T,
    )

    out_dir = tempfile.mkdtemp(prefix="serving_bench_")
    t0 = time.perf_counter()
    export_model(im, out_dir, buckets=[(H, W)], batch=B,
                 vocab_path=vocab_file.name)
    export_s = time.perf_counter() - t0
    artifact_mb = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
    ) / 1e6

    sm = load_exported(out_dir)
    fn = sm.forward_fn()
    dev_inputs = tuple(jnp.asarray(x) for x in inputs)
    dev_params = jax.tree_util.tree_map(jnp.asarray, sm.params)

    t0 = time.perf_counter()
    out = fn(dev_params, *dev_inputs)
    np.asarray(out["pred_boxes"])  # compile + settle (host fetch fences on axon)
    first_call_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args_cli.iters):
            out = fn(dev_params, *dev_inputs)
            np.asarray(out["pred_boxes"])
        best = min(best, (time.perf_counter() - t0) / args_cli.iters)

    print(json.dumps({
        "metric": "AOT serving latency (Swin-T)" if not args_cli.nano
        else "AOT serving latency (nano, cpu)",
        "aot_latency_ms": round(best * 1e3, 2),
        "aot_img_s": round(B / best, 3),
        "first_call_s": round(first_call_s, 2),
        "export_s": round(export_s, 2),
        "artifact_mb": round(artifact_mb, 1),
        "bucket": f"{H}x{W}",
        "batch": B,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()

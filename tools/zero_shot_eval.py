#!/usr/bin/env python3
"""One-command zero-shot COCO eval readiness path (VERDICT r4 item 8).

The north-star gate — zero-shot Swin-T mAP within 0.3 of 48.4 on COCO
val2017 (/root/reference/README.md:179-185) — is environment-blocked here
(zero egress: no published .pth, no bert vocab.txt, no val2017 frames).
This tool is the exact runbook for the day the assets appear: from
(checkpoint, vocab, images, annotations) to the 12-number COCO summary
with zero additional code.

    python tools/zero_shot_eval.py \
        --checkpoint groundingdino_swint_ogc.pth \
        --vocab vocab.txt \
        --images  /data/coco/val2017 \
        --annotations /data/coco/annotations/instances_val2017.json \
        [--config open_groundingdino_tpu/config/cfg_coco.py] \
        [--output_dir out_zeroshot] [--options key=value ...]

Accepts a torch .pth (converted through utils/checkpoint, the path the
converter-manifest tests pin) or an orbax checkpoint directory.  Exercised
in CI with a synthetic .pth + nano config (tests/test_inference_e2e.py::
test_zero_shot_eval_tool).  Reference analog: main.py --eval
(/root/reference/main.py:385-396).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser("zero_shot_eval")
    p.add_argument("--checkpoint", required=True,
                   help="torch .pth (published GroundingDINO) or orbax dir")
    p.add_argument("--vocab", required=True, help="bert-base vocab.txt")
    p.add_argument("--images", required=True, help="val2017 image root")
    p.add_argument("--annotations", required=True,
                   help="instances_val2017.json")
    p.add_argument("--config", default=os.path.join(
        REPO, "open_groundingdino_tpu", "config", "cfg_coco.py"))
    p.add_argument("--output_dir", default="out_zeroshot")
    p.add_argument("--options", nargs="+", default=None,
                   help="config overrides: key=value ...")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--debug", action="store_true",
                   help="truncate after 15 batches (smoke)")
    return p.parse_args()


def main():
    a = parse_args()
    os.makedirs(a.output_dir, exist_ok=True)
    manifest = {
        "val": [{
            "root": os.path.abspath(a.images),
            "anno": os.path.abspath(a.annotations),
            "dataset_mode": "coco",
        }]
    }
    manifest_path = os.path.join(a.output_dir, "datasets_val.json")
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)

    import main as main_mod

    cli = main_mod.get_args_parser().parse_args([
        "-c", a.config,
        "--datasets", manifest_path,
        "--output_dir", a.output_dir,
        "--vocab", a.vocab,
        "--pretrain_model_path", a.checkpoint,
        "--eval",
        "--num_workers", str(a.num_workers),
    ] + (["--debug"] if a.debug else [])
      + (["--options"] + a.options if a.options else []))
    main_mod.main(cli)

    with open(os.path.join(a.output_dir, "eval_stats.json")) as f:
        stats = json.load(f)
    # the pycocotools 12-line summary shape (eval/coco_eval.py summarize)
    rows = [
        ("Average Precision  (AP) @[ IoU=0.50:0.95 | area=   all | maxDets=100 ]", "AP"),
        ("Average Precision  (AP) @[ IoU=0.50      | area=   all | maxDets=100 ]", "AP50"),
        ("Average Precision  (AP) @[ IoU=0.75      | area=   all | maxDets=100 ]", "AP75"),
        ("Average Precision  (AP) @[ IoU=0.50:0.95 | area= small | maxDets=100 ]", "APs"),
        ("Average Precision  (AP) @[ IoU=0.50:0.95 | area=medium | maxDets=100 ]", "APm"),
        ("Average Precision  (AP) @[ IoU=0.50:0.95 | area= large | maxDets=100 ]", "APl"),
        ("Average Recall     (AR) @[ IoU=0.50:0.95 | area=   all | maxDets=  1 ]", "AR1"),
        ("Average Recall     (AR) @[ IoU=0.50:0.95 | area=   all | maxDets= 10 ]", "AR10"),
        ("Average Recall     (AR) @[ IoU=0.50:0.95 | area=   all | maxDets=100 ]", "AR100"),
        ("Average Recall     (AR) @[ IoU=0.50:0.95 | area= small | maxDets=100 ]", "ARs"),
        ("Average Recall     (AR) @[ IoU=0.50:0.95 | area=medium | maxDets=100 ]", "ARm"),
        ("Average Recall     (AR) @[ IoU=0.50:0.95 | area= large | maxDets=100 ]", "ARl"),
    ]
    for label, key in rows:
        print(f" {label} = {stats[key]:.3f}")
    print(json.dumps(stats))


if __name__ == "__main__":
    main()

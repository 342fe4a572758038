#!/usr/bin/env python3
"""PAVE single-image damage inference (reference inference_on_a_image_pave.py).

The car bbox seeding the crop grid comes from either ``--car_bbox`` (as the
reference's batch harness also supports) or ``--car_seg_checkpoint``: a
native RepViT+Semantic-FPN segmentor (pave/repvit_seg.py — the TPU
equivalent of the reference's mmseg ``repvit_stuff`` stage,
`/root/reference/inference_on_a_image_pave.py:187-283,337-357`) whose car
mask is reduced to a tight bbox.

    python tools/inference_pave.py -c CONFIG -p CKPT --vocab vocab.txt \
        -i frame.jpg --car_bbox 400,300,1500,900 \
        [--car_seg_checkpoint seg.msgpack --car_seg_variant m1_1] \
        [-t "dent . scratch . broken ."] [-o out_dir]

Slides 512x512 crops over the (padded) car bbox, runs the detector per crop
batch, translates detections back to frame coordinates, NMS-merges, draws.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from open_groundingdino_tpu.inference import load_model, predict
from open_groundingdino_tpu.pave import crop_utils
from open_groundingdino_tpu.pave.engine import merge_crop_predictions
from open_groundingdino_tpu.utils.visualizer import draw_boxes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--checkpoint_path", "-p", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--image_path", "-i", required=True)
    ap.add_argument("--car_bbox", default=None,
                    help="x0,y0,x1,y1 in frame pixels")
    ap.add_argument("--car_seg_checkpoint", default=None,
                    help="flax msgpack of a pave.repvit_seg.RepViTSegmentor;"
                         " derives the car bbox when --car_bbox is absent")
    ap.add_argument("--car_seg_variant", default="m1_1")
    ap.add_argument("--car_seg_infer_size", default="512,1024",
                    help="h,w the frame is resized to for segmentation")
    ap.add_argument("--text_prompt", "-t",
                    default="dent . scratch . missing . scraped . broken .")
    ap.add_argument("--output_dir", "-o", default="pave_out")
    ap.add_argument("--box_threshold", type=float, default=0.3)
    ap.add_argument("--text_threshold", type=float, default=0.25)
    ap.add_argument("--nms_iou", type=float, default=0.5)
    args = ap.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    model = load_model(args.config_file, args.checkpoint_path, args.vocab)
    frame = Image.open(args.image_path).convert("RGB")
    arr = np.asarray(frame)
    if args.car_bbox is not None:
        car = [float(v) for v in args.car_bbox.split(",")]
    elif args.car_seg_checkpoint is not None:
        from open_groundingdino_tpu.pave.repvit_seg import (
            RepViTConfig, load_segmentor_params, derive_car_bbox)
        cfg = RepViTConfig.from_name(args.car_seg_variant)
        seg_params = load_segmentor_params(args.car_seg_checkpoint, cfg)
        ih, iw = (int(v) for v in args.car_seg_infer_size.split(","))
        car = derive_car_bbox(seg_params, arr, cfg, infer_size=(ih, iw))
        if car is None:
            raise SystemExit("car segmentor found no car pixels in the frame")
        print(f"car bbox from segmentation: {[round(v, 1) for v in car]}")
    else:
        raise SystemExit("one of --car_bbox / --car_seg_checkpoint required")

    crop_boxes = crop_utils.create_crop_boxes(arr.shape[:2], car)
    crop_results = []
    for cb in crop_boxes:
        crop_img = Image.fromarray(crop_utils.crop_image(arr, cb))
        boxes, scores, phrases = predict(
            model, crop_img, args.text_prompt,
            box_threshold=args.box_threshold,
            text_threshold=args.text_threshold,
            size=512, max_size=512,
        )
        # cxcywh normalized (512 crop) -> xyxy crop pixels
        if len(boxes):
            b = boxes * 512.0
            xyxy = np.stack(
                [b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                 b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], axis=1,
            )
        else:
            xyxy = np.zeros((0, 4), np.float32)
        crop_results.append({"scores": scores, "boxes": xyxy, "phrases": phrases})

    merged = merge_crop_predictions(crop_results, crop_boxes, args.nms_iou)
    with open(os.path.join(args.output_dir, "pred.json"), "w") as f:
        json.dump(
            {
                "boxes_xyxy": merged["boxes"].tolist(),
                "scores": merged["scores"].tolist(),
                "phrases": merged["phrases"],
                "n_crops": len(crop_boxes),
            },
            f, indent=2,
        )
    vis = draw_boxes(frame, merged["boxes"], merged["phrases"], merged["scores"])
    vis.save(os.path.join(args.output_dir, "pred.jpg"))
    print(f"{len(merged['boxes'])} detections from {len(crop_boxes)} crops "
          f"-> {args.output_dir}")


if __name__ == "__main__":
    main()

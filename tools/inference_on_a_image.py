#!/usr/bin/env python3
"""Single-image zero-shot inference (reference tools/inference_on_a_image.py).

    python tools/inference_on_a_image.py -c CONFIG -p CKPT --vocab vocab.txt \
        -i image.jpg -t "dog . cat ." -o out_dir \
        [--box_threshold 0.3] [--text_threshold 0.25]

Writes pred.json (boxes cxcywh normalized + phrases + scores) and, if PIL
can draw, an annotated image.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image, ImageDraw

from open_groundingdino_tpu.inference import load_model, predict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--checkpoint_path", "-p", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--image_path", "-i", required=True)
    ap.add_argument("--text_prompt", "-t", required=True)
    ap.add_argument("--output_dir", "-o", default="pred_out")
    ap.add_argument("--box_threshold", type=float, default=0.3)
    ap.add_argument("--text_threshold", type=float, default=0.25)
    ap.add_argument(
        "--token_spans", default=None,
        help="given-phrase mode (reference inference_on_a_image.py:116-142): "
             "python literal list of char-span lists, e.g. "
             '"[[(0, 3)], [(6, 9)]]" — scores each phrase by its mean token '
             "prob instead of thresholded max-token",
    )
    args = ap.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    model = load_model(args.config_file, args.checkpoint_path, args.vocab)
    image = Image.open(args.image_path).convert("RGB")
    if args.token_spans is not None:
        import ast

        from open_groundingdino_tpu.inference import predict_with_spans

        spans = ast.literal_eval(args.token_spans)
        boxes, scores, phrases = predict_with_spans(
            model, image, args.text_prompt, spans,
            box_threshold=args.box_threshold,
        )
    else:
        boxes, scores, phrases = predict(
            model, image, args.text_prompt,
            box_threshold=args.box_threshold, text_threshold=args.text_threshold,
        )

    with open(os.path.join(args.output_dir, "pred.json"), "w") as f:
        json.dump(
            {
                "boxes_cxcywh_norm": boxes.tolist(),
                "scores": scores.tolist(),
                "phrases": phrases,
            },
            f,
            indent=2,
        )

    w, h = image.size
    draw = ImageDraw.Draw(image)
    for (cx, cy, bw, bh), s, ph in zip(boxes, scores, phrases):
        x0, y0 = (cx - bw / 2) * w, (cy - bh / 2) * h
        x1, y1 = (cx + bw / 2) * w, (cy + bh / 2) * h
        draw.rectangle([x0, y0, x1, y1], outline=(255, 0, 0), width=3)
        draw.text((x0, max(y0 - 12, 0)), f"{ph} {s:.2f}", fill=(255, 0, 0))
    image.save(os.path.join(args.output_dir, "pred.jpg"))
    print(f"{len(boxes)} detections -> {args.output_dir}")


if __name__ == "__main__":
    main()

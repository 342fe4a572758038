#!/usr/bin/env python3
"""CSV-driven batch inference (reference tools/inference_from_csv.py:210-326).

Reads a CSV manifest with an image column ('input' — a local path here; the
reference fetches CDN urls, which pave/infer_utils gates behind
PAVE_ALLOW_CDN in this zero-egress environment), runs grounded detection on
each row with one caption, and writes a results CSV with the top box per
image (the reference's output shape) plus all boxes as JSON.

    python tools/inference_from_csv.py -c CONFIG -p CKPT --vocab vocab.txt \
        --csv manifest.csv -t "dent . scratch ." -o results.csv \
        [--image_col input] [--idx 0 --chunks 1] [--draw_dir out/]
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image, ImageDraw


def main():
    ap = argparse.ArgumentParser("CSV batch inference")
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--checkpoint_path", "-p", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--text_prompt", "-t", required=True)
    ap.add_argument("--output", "-o", default="inference_results.csv")
    ap.add_argument("--image_col", default="input")
    ap.add_argument("--box_threshold", type=float, default=0.3)
    ap.add_argument("--text_threshold", type=float, default=0.25)
    # reference's sharding knobs for parallel runs over a big manifest
    ap.add_argument("--idx", type=int, default=0)
    ap.add_argument("--chunks", type=int, default=1)
    ap.add_argument("--draw_dir", default=None,
                    help="optionally save box-overlay images here")
    args = ap.parse_args()

    from open_groundingdino_tpu.inference import load_model, predict

    def cxcywh_to_xyxy_abs(box, H, W):
        """reference inference_from_csv.py:21-32 xywh_to_xyxy: normalized
        cxcywh -> absolute xyxy."""
        cx, cy, w, h = (box * np.asarray([W, H, W, H], np.float32)).tolist()
        return [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]

    model = load_model(args.config_file, args.checkpoint_path, args.vocab)

    with open(args.csv, newline="") as f:
        rows = list(csv.DictReader(f))
    rows = rows[args.idx::args.chunks]

    if args.draw_dir:
        os.makedirs(args.draw_dir, exist_ok=True)

    results = []
    t0 = time.time()
    for i, row in enumerate(rows):
        src = row[args.image_col]
        try:
            image = Image.open(src).convert("RGB")
        except Exception as e:  # missing/corrupt file: skip like upstream
            print(f"skip {src}: {e}")
            continue
        boxes, scores, phrases = predict(
            model, image, args.text_prompt,
            box_threshold=args.box_threshold,
            text_threshold=args.text_threshold,
        )
        W, H = image.size
        xyxy = [cxcywh_to_xyxy_abs(np.asarray(b, np.float32), H, W)
                for b in boxes]
        if xyxy:
            top = xyxy[0]
        else:  # reference emits a sentinel row when nothing is found
            top = [17.0, 17.0, 17.0, 17.0]
            phrases = ["-17"]
        results.append({
            "input": src,
            "bbox": json.dumps(top),
            "size": json.dumps([H, W]),
            "labels": json.dumps(list(phrases)),
            "all_boxes": json.dumps(xyxy),
            "all_scores": json.dumps(np.asarray(scores).tolist()),
        })
        if args.draw_dir and xyxy:
            im = image.copy()
            d = ImageDraw.Draw(im)
            for b, ph in zip(xyxy, phrases):
                d.rectangle(b, outline=(255, 0, 0), width=2)
                d.text((b[0], max(0, b[1] - 12)), str(ph), fill=(255, 0, 0))
            im.save(os.path.join(args.draw_dir, f"pred{i}.jpg"))

    with open(args.output, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["input", "bbox", "size", "labels", "all_boxes",
                           "all_scores"])
        w.writeheader()
        w.writerows(results)
    print(f"{len(results)} rows -> {args.output} in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()

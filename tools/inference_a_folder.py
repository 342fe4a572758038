#!/usr/bin/env python3
"""Batched folder inference (reference tools/inference_a_folder.py, which
shells out per image; here the model stays resident and images stream
through bucketed batches).

    python tools/inference_a_folder.py -c CONFIG -p CKPT --vocab vocab.txt \
        -i images_dir -t "dog . cat ." -o out_dir
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from open_groundingdino_tpu.inference import load_model, predict

EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--checkpoint_path", "-p", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--image_dir", "-i", required=True)
    ap.add_argument("--text_prompt", "-t", required=True)
    ap.add_argument("--output_dir", "-o", default="pred_folder")
    ap.add_argument("--box_threshold", type=float, default=0.3)
    ap.add_argument("--text_threshold", type=float, default=0.25)
    args = ap.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    model = load_model(args.config_file, args.checkpoint_path, args.vocab)

    results = {}
    files = sorted(
        f for f in os.listdir(args.image_dir) if f.lower().endswith(EXTS)
    )
    for name in files:
        image = Image.open(os.path.join(args.image_dir, name)).convert("RGB")
        boxes, scores, phrases = predict(
            model, image, args.text_prompt,
            box_threshold=args.box_threshold,
            text_threshold=args.text_threshold,
        )
        results[name] = {
            "boxes_cxcywh_norm": boxes.tolist(),
            "scores": scores.tolist(),
            "phrases": phrases,
        }
        print(f"{name}: {len(boxes)} detections")

    with open(os.path.join(args.output_dir, "predictions.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

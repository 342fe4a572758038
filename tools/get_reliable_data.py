#!/usr/bin/env python3
"""Reliable-data curation: agreement filtering between two detectors'
car boxes (reference tools/get_reliable_data.py:44-179 — corner-L2
comparison between 'dino_bbox' and 'swints_bbox' columns, threshold
filtering, and box-overlay visualization; the reference operates on
hardcoded cluster CSVs, this version takes them as arguments).

    python tools/get_reliable_data.py --csv merged.csv \
        [--a_col dino_bbox --b_col swints_bbox] \
        [--max_tl 20 --max_br 20] [-o reliable.csv] [--draw_dir out/]
"""
from __future__ import annotations

import argparse
import csv
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_box(s):
    if isinstance(s, (list, tuple)):
        return list(s)
    try:
        v = json.loads(s)
    except (json.JSONDecodeError, TypeError):
        return None
    return v if isinstance(v, list) and len(v) == 4 else None


def corner_l2(b1, b2):
    """(top-left L2, bottom-right L2) between two xyxy boxes (reference
    l2_loss_top_left/l2_loss_bottom_right; -17 sentinel on malformed)."""
    if b1 is None or b2 is None or len(b1) != 4 or len(b2) != 4:
        return -17.0, -17.0
    tl = math.hypot(b1[0] - b2[0], b1[1] - b2[1])
    br = math.hypot(b1[2] - b2[2], b1[3] - b2[3])
    return tl, br


def main():
    ap = argparse.ArgumentParser("reliable-data agreement filter")
    ap.add_argument("--csv", required=True,
                    help="merged CSV with both detectors' boxes per row")
    ap.add_argument("--a_col", default="dino_bbox")
    ap.add_argument("--b_col", default="swints_bbox")
    ap.add_argument("--image_col", default="input")
    ap.add_argument("--max_tl", type=float, default=20.0)
    ap.add_argument("--max_br", type=float, default=20.0)
    ap.add_argument("--output", "-o", default="reliable.csv")
    ap.add_argument("--draw_dir", default=None,
                    help="save side-by-side box overlays for kept rows "
                         "(image_col must be local paths)")
    args = ap.parse_args()

    with open(args.csv, newline="") as f:
        rows = list(csv.DictReader(f))

    kept = []
    for row in rows:
        a = _parse_box(row.get(args.a_col))
        b = _parse_box(row.get(args.b_col))
        tl, br = corner_l2(a, b)
        row = dict(row, tl_loss=f"{tl:.2f}", br_loss=f"{br:.2f}")
        if 0 <= tl <= args.max_tl and 0 <= br <= args.max_br:
            kept.append(row)

    if kept:
        with open(args.output, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(kept[0].keys()))
            w.writeheader()
            w.writerows(kept)
    print(f"{len(kept)}/{len(rows)} rows within "
          f"(tl<={args.max_tl}, br<={args.max_br}) -> {args.output}")

    if args.draw_dir:
        from PIL import Image, ImageDraw

        os.makedirs(args.draw_dir, exist_ok=True)
        for i, row in enumerate(kept):
            src = row.get(args.image_col, "")
            if not os.path.exists(src):
                continue
            im = Image.open(src).convert("RGB")
            d = ImageDraw.Draw(im)
            for box, color in ((_parse_box(row[args.a_col]), (255, 0, 0)),
                               (_parse_box(row[args.b_col]), (0, 255, 0))):
                if box:
                    d.rectangle(box, outline=color, width=3)
            im.save(os.path.join(
                args.draw_dir, f"cmp_{i}_{os.path.basename(src)}"))


if __name__ == "__main__":
    main()

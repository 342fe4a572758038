#!/usr/bin/env python3
"""PAVE metrics CLI (reference get_metrics.py): read a batch-eval CSV
(pave/batch_eval.py output) and print frame-averaged precision/recall/
accuracy/specificity plus a threshold sweep.

    python tools/get_metrics.py results.csv [--iou 0.5] [--dist 400]
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_groundingdino_tpu.pave.metrics import summarize, threshold_sweep


def load_records(path: str):
    records = []
    with open(path) as f:
        for row in csv.DictReader(f):
            per_pred = {
                int(k): tuple(v) for k, v in json.loads(row["metrics_per_pred"]).items()
            }
            per_gt = {
                int(k): tuple(v) for k, v in json.loads(row["metrics_per_gt"]).items()
            }
            records.append((per_pred, per_gt))
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_path")
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--dist", type=float, default=400.0)
    args = ap.parse_args()

    records = load_records(args.csv_path)
    s = summarize(records, args.iou, args.dist)
    print(f"frames={len(records)} iou>={args.iou} dist<={args.dist}")
    for k, v in s.items():
        print(f"  {k}: {v:.4f}")
    print("threshold sweep:")
    for row in threshold_sweep(records):
        print(
            f"  iou={row['iou_thresh']:<4} dist={row['dist_thresh']:<5} "
            f"P={row['precision']:.3f} R={row['recall']:.3f}"
        )


if __name__ == "__main__":
    main()

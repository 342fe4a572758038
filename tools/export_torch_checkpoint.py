#!/usr/bin/env python3
"""Export a trained Orbax checkpoint to a reference-compatible torch .pth.

    python tools/export_torch_checkpoint.py \
        --checkpoint out/checkpoint_11 --output gdino_tpu.pth [--ema]

The inverse of the ingestion path (utils/checkpoint.py
convert_groundingdino_checkpoint): weights trained with this framework
load into the upstream PyTorch GroundingDINO via its usual
`model.load_state_dict(clean_state_dict(ckpt["model"]), strict=False)`
(reference tools/inference_on_a_image.py:84-87).  `--checkpoint` may be a
specific `checkpoint_N` directory or an output_dir, in which case the
latest checkpoint inside it is used.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_groundingdino_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_torch_checkpoint,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", "-c", required=True,
                    help="checkpoint_N directory, or an output_dir "
                         "containing checkpoint_* (latest picked)")
    ap.add_argument("--output", "-o", required=True, help="output .pth path")
    ap.add_argument("--ema", action="store_true",
                    help="export the EMA weights instead of the raw params")
    args = ap.parse_args()

    path = args.checkpoint
    if not os.path.basename(path).startswith("checkpoint_"):
        found = latest_checkpoint(path)
        if found is None:
            raise SystemExit(f"no checkpoint_* under {path}")
        path = found
    payload = restore_checkpoint(path)
    state = payload.get("state", payload)
    params = state.get("ema_params") if args.ema else state.get("params")
    if params is None:
        key = "ema_params" if args.ema else "params"
        raise SystemExit(f"checkpoint at {path} has no '{key}'")
    save_torch_checkpoint(
        args.output, params,
        epoch=payload.get("epoch", -1), source="open_groundingdino_tpu",
    )
    print(f"wrote {args.output} ({os.path.getsize(args.output)/1e6:.1f} MB) "
          f"from {path}")


if __name__ == "__main__":
    main()

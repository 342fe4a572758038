#!/usr/bin/env python3
"""Export a checkpoint as a compile-free serving artifact (StableHLO via
jax.export; see open_groundingdino_tpu/serving.py for the artifact layout).

    python tools/export_model.py -c CONFIG --checkpoint ckpt.pth \
        --vocab vocab.txt -o artifact_dir [--bucket 800x1216 ...] [--batch 1]

Run on the target backend (TPU) to embed the Pallas kernels; exporting on
CPU produces the portable XLA-path artifact.  The serving host then needs
only `load_exported` + the host-side pre/post-processing — no model build,
no retrace, no first-call compile of the lowering.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--checkpoint", required=True,
                    help=".pth (torch, converted on load) or orbax dir")
    ap.add_argument("--vocab", required=True, help="bert vocab.txt")
    ap.add_argument("--output_dir", "-o", required=True)
    ap.add_argument("--bucket", action="append", default=None,
                    help="HxW static shape to export (repeatable); "
                         "default: every config image bucket")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platform", action="append", default=None,
                    help="jax.export lowering platform (repeatable), e.g. "
                         "tpu; default: the current backend")
    args = ap.parse_args()

    from open_groundingdino_tpu.inference import load_model
    from open_groundingdino_tpu.serving import export_model

    buckets = None
    if args.bucket:
        buckets = []
        for b in args.bucket:
            h, w = b.lower().split("x")
            buckets.append((int(h), int(w)))

    im = load_model(args.config_file, args.checkpoint, args.vocab)
    written = export_model(
        im, args.output_dir, buckets=buckets, batch=args.batch,
        platforms=args.platform, vocab_path=args.vocab,
    )
    print(f"wrote {len(written)} files to {args.output_dir}:")
    for name in written:
        sz = os.path.getsize(os.path.join(args.output_dir, name))
        print(f"  {name}  {sz/1e6:.2f} MB")


if __name__ == "__main__":
    main()

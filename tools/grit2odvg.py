#!/usr/bin/env python3
"""GRIT -> ODVG(VG) jsonl converter (reference tools/grit2odvg.py).

Each GRIT record has `caption`, `ref_exps` [[beg, end, x0n, y0n, x1n, y1n,
score], ...] with normalized boxes and char spans into the caption.  Emits
{"filename", "height", "width", "grounding": {"caption", "regions":
[{"bbox" xyxy abs, "phrase"}]}} lines.

The reference filters phrases with spacy noun-chunk analysis
(grit2odvg.py:36-45); spacy is not shipped here, so the filter keeps phrases
of <= max_phrase_words words that are not pure stopwords — same intent,
dependency-free.
"""
from __future__ import annotations

import argparse
import json
from multiprocessing import Pool

STOPWORDS = {
    "a", "an", "the", "this", "that", "these", "those", "it", "its",
    "his", "her", "their", "there", "here", "of", "in", "on", "at",
}


def phrase_ok(phrase: str, max_words: int = 6) -> bool:
    words = phrase.strip().lower().split()
    if not words or len(words) > max_words:
        return False
    return not all(w in STOPWORDS for w in words)


def convert_record(meta: dict, min_score: float = 0.7):
    caption = meta.get("caption", "")
    regions = []
    for exp in meta.get("ref_exps", []):
        beg, end = int(exp[0]), int(exp[1])
        phrase = caption[beg:end]
        if not phrase_ok(phrase):
            continue
        if len(exp) > 6 and float(exp[6]) < min_score:
            continue
        w, h = meta["width"], meta["height"]
        regions.append(
            {
                "bbox": [exp[2] * w, exp[3] * h, exp[4] * w, exp[5] * h],
                "phrase": phrase,
            }
        )
    if not regions:
        return None
    return {
        "filename": meta.get("key", meta.get("filename", "")) ,
        "height": meta["height"],
        "width": meta["width"],
        "grounding": {"caption": caption, "regions": regions},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="GRIT jsonl")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min_score", type=float, default=0.7)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    with open(args.input) as f:
        metas = [json.loads(line) for line in f]
    with Pool(args.workers) as pool:
        out = pool.starmap(
            convert_record, [(m, args.min_score) for m in metas], chunksize=256
        )
    n = 0
    with open(args.output, "w") as f:
        for rec in out:
            if rec is not None:
                f.write(json.dumps(rec) + "\n")
                n += 1
    print(f"wrote {n}/{len(metas)} records")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""COCO json -> ODVG jsonl converter (reference tools/coco2odvg.py).

    python tools/coco2odvg.py --input instances_train2017.json \
        --output train.jsonl --label_map label_map.json

Emits one jsonl line per image: {"filename", "height", "width",
"detection": {"instances": [{"bbox" xyxy, "label" contiguous-id,
"category"}]}} and a {contiguous_id: name} label map — the format
datasets/odvg expects.  The COCO 80->90 id compaction is implicit in the
contiguous remap.
"""
from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--label_map", required=True)
    args = ap.parse_args()

    with open(args.input) as f:
        coco = json.load(f)

    cats = sorted(coco["categories"], key=lambda c: c["id"])
    id2contig = {c["id"]: i for i, c in enumerate(cats)}
    label_map = {str(i): c["name"] for i, c in enumerate(cats)}

    anns_by_img = {}
    for a in coco["annotations"]:
        if a.get("iscrowd", 0):
            continue
        anns_by_img.setdefault(a["image_id"], []).append(a)

    n = 0
    with open(args.output, "w") as out:
        for img in coco["images"]:
            anns = anns_by_img.get(img["id"], [])
            if not anns:
                continue
            instances = []
            for a in anns:
                x, y, w, h = a["bbox"]
                instances.append(
                    {
                        "bbox": [x, y, x + w, y + h],
                        "label": id2contig[a["category_id"]],
                        "category": label_map[str(id2contig[a["category_id"]])],
                    }
                )
            out.write(
                json.dumps(
                    {
                        "filename": img["file_name"],
                        "height": img["height"],
                        "width": img["width"],
                        "detection": {"instances": instances},
                    }
                )
                + "\n"
            )
            n += 1

    with open(args.label_map, "w") as f:
        json.dump(label_map, f)
    print(f"wrote {n} images, {len(label_map)} categories")


if __name__ == "__main__":
    main()

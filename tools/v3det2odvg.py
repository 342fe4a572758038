#!/usr/bin/env python3
"""V3Det -> ODVG(OD) jsonl converter (reference tools/v3det2odvg.py).
V3Det ships COCO-format annotations with ~13k categories; output is the
ODVG OD format + label map, identical mechanics to coco2odvg but keeping
the category name from `name` and dropping `iscrowd`-less checks."""
from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--label_map", required=True)
    args = ap.parse_args()

    with open(args.input) as f:
        data = json.load(f)

    cats = sorted(data["categories"], key=lambda c: c["id"])
    id2contig = {c["id"]: i for i, c in enumerate(cats)}
    label_map = {str(i): c["name"] for i, c in enumerate(cats)}

    anns = defaultdict(list)
    for a in data["annotations"]:
        anns[a["image_id"]].append(a)

    n = 0
    with open(args.output, "w") as out:
        for img in data["images"]:
            rows = anns.get(img["id"], [])
            if not rows:
                continue
            instances = []
            for a in rows:
                x, y, w, h = a["bbox"]
                lbl = id2contig[a["category_id"]]
                instances.append(
                    {"bbox": [x, y, x + w, y + h], "label": lbl,
                     "category": label_map[str(lbl)]}
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

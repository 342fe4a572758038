#!/usr/bin/env python3
"""Flickr30k Entities -> ODVG(VG) jsonl converter
(reference tools/flickr30ke2odvg.py:9-151).

Inputs: the Annotations/ (XML boxes per entity id) and Sentences/ (tokenized
sentences with [/EN#id/type phrase] markup) directories.  Emits grounding
records with one region per (phrase, box) pair from the first sentence.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import xml.etree.ElementTree as ET

PHRASE_RE = re.compile(r"\[/EN#(\d+)(?:/[^\s\]]+)?\s([^\]]+)\]")


def parse_boxes(xml_path: str):
    root = ET.parse(xml_path).getroot()
    size = root.find("size")
    w = int(size.find("width").text)
    h = int(size.find("height").text)
    boxes = {}
    for obj in root.findall("object"):
        names = [n.text for n in obj.findall("name")]
        bb = obj.find("bndbox")
        if bb is None:
            continue
        box = [
            float(bb.find("xmin").text), float(bb.find("ymin").text),
            float(bb.find("xmax").text), float(bb.find("ymax").text),
        ]
        for name in names:
            boxes.setdefault(name, []).append(box)
    return w, h, boxes


def parse_sentence(line: str):
    """-> (clean caption, [(entity_id, phrase)])."""
    ents = [(m.group(1), m.group(2)) for m in PHRASE_RE.finditer(line)]
    caption = PHRASE_RE.sub(lambda m: m.group(2), line).strip()
    return caption, ents


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotations", required=True, help="Annotations/ dir")
    ap.add_argument("--sentences", required=True, help="Sentences/ dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--image_ext", default=".jpg")
    args = ap.parse_args()

    n = 0
    with open(args.output, "w") as out:
        for fname in sorted(os.listdir(args.annotations)):
            if not fname.endswith(".xml"):
                continue
            image_id = fname[:-4]
            sent_path = os.path.join(args.sentences, image_id + ".txt")
            if not os.path.exists(sent_path):
                continue
            w, h, boxes = parse_boxes(os.path.join(args.annotations, fname))
            with open(sent_path) as f:
                first = f.readline().strip()
            caption, ents = parse_sentence(first)
            regions = []
            for ent_id, phrase in ents:
                for box in boxes.get(ent_id, []):
                    regions.append({"bbox": box, "phrase": phrase.strip()})
            if not regions:
                continue
            out.write(
                json.dumps(
                    {
                        "filename": image_id + args.image_ext,
                        "height": h,
                        "width": w,
                        "grounding": {"caption": caption, "regions": regions},
                    }
                )
                + "\n"
            )
            n += 1
    print(f"wrote {n} records")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Offline dataset prep: Cityscapes gtFine polygons -> VOC XML trees + split txts.

Consolidates the reference's four offline tools (behavioral equivalents):
- ``tools/trans_seg_to_det_multi.py`` — 8-class polygon->bbox XML conversion;
- ``tools/trans_seg_to_det.py``       — car-only variant (--classes car);
- ``tools/make_VOC_txt.py``           — train.txt from non-empty XMLs, with the
  ``*_leftImg8bit`` filename normalization;
- ``tools/make_foggy_VOC_txt.py``     — foggy beta-suffix triplication
  (``make_foggy_VOC_txt.py:20-22``) + val.txt.

Usage:
  python tools/cityscapes_to_voc.py convert --gtfine .../gtFine/train \
      --out .../VOC2007_citytrain/Annotations [--classes car]
  python tools/cityscapes_to_voc.py make-txt --path .../VOC2007_citytrain \
      --split train
  python tools/cityscapes_to_voc.py make-foggy-txt --path .../VOC2007_foggytrain \
      --split train [--betas 0.005 0.01 0.02]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import xml.etree.ElementTree as ET

ALL_CLASSES = ("car", "person", "rider", "truck", "bus", "train", "motorcycle", "bicycle")


def polygon_bbox(polygon):
    xs = [p[0] for p in polygon]
    ys = [p[1] for p in polygon]
    return min(xs), min(ys), max(xs), max(ys)


def convert_one(json_path: str, classes) -> ET.Element:
    with open(json_path) as f:
        data = json.load(f)
    root = ET.Element("annotation")
    ET.SubElement(root, "folder").text = "Cityscapes"
    base = os.path.basename(json_path).split(".")[0]
    stem = base[:-16] if base.endswith("_gtFine_polygons") else base
    ET.SubElement(root, "filename").text = stem + ".png"
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "width").text = str(data["imgWidth"])
    ET.SubElement(size, "height").text = str(data["imgHeight"])
    ET.SubElement(size, "depth").text = "3"
    for obj in data["objects"]:
        label = obj["label"]
        if label.endswith("group"):  # cargroup -> car etc. (cityscapes convention)
            label = label[: -len("group")]
        if label not in classes:
            continue
        x1, y1, x2, y2 = polygon_bbox(obj["polygon"])
        x1 = max(0, x1)
        y1 = max(0, y1)
        x2 = min(data["imgWidth"] - 1, x2)
        y2 = min(data["imgHeight"] - 1, y2)
        if x2 <= x1 or y2 <= y1:
            continue
        o = ET.SubElement(root, "object")
        ET.SubElement(o, "name").text = label
        ET.SubElement(o, "difficult").text = "0"
        bb = ET.SubElement(o, "bndbox")
        ET.SubElement(bb, "xmin").text = str(int(x1) + 1)
        ET.SubElement(bb, "ymin").text = str(int(y1) + 1)
        ET.SubElement(bb, "xmax").text = str(int(x2) + 1)
        ET.SubElement(bb, "ymax").text = str(int(y2) + 1)
    return root


def cmd_convert(args):
    classes = tuple(args.classes) if args.classes else ALL_CLASSES
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for city in sorted(os.listdir(args.gtfine)):
        cdir = os.path.join(args.gtfine, city)
        if not os.path.isdir(cdir):
            continue
        for jf in sorted(glob.glob(os.path.join(cdir, "*_gtFine_polygons.json"))):
            xml = convert_one(jf, classes)
            stem = os.path.basename(jf)[: -len("_gtFine_polygons.json")]
            ET.ElementTree(xml).write(os.path.join(args.out, stem + "_leftImg8bit.xml"))
            n += 1
    print(f"converted {n} annotations -> {args.out}")


def _nonempty(ann_path: str) -> bool:
    return len(ET.parse(ann_path).getroot().findall("object")) > 0


def cmd_make_txt(args):
    anns = sorted(glob.glob(os.path.join(args.path, "Annotations", "*.xml")))
    out = os.path.join(args.path, "ImageSets", "Main", args.split + ".txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    count = 0
    with open(out, "w") as f:
        for ann in anns:
            if not _nonempty(ann):
                continue
            f.write(os.path.basename(ann)[:-4] + "\n")
            count += 1
    print(f"{count}/{len(anns)} -> {out}")


def cmd_make_foggy_txt(args):
    """Triplicate each XML for the foggy beta variants, then write the split txt."""
    anns = sorted(glob.glob(os.path.join(args.path, "Annotations", "*.xml")))
    for ann in anns:
        stem = os.path.basename(ann)[:-4]
        if any(f"_beta_{b}" in stem for b in args.betas):
            continue
        base = stem.replace("_leftImg8bit", "")
        for b in args.betas:
            dst = os.path.join(os.path.dirname(ann), f"{base}_leftImg8bit_foggy_beta_{b}.xml")
            shutil.copyfile(ann, dst)
        os.remove(ann)
    cmd_make_txt(args)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert")
    c.add_argument("--gtfine", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--classes", nargs="*", default=None)
    c.set_defaults(fn=cmd_convert)
    t = sub.add_parser("make-txt")
    t.add_argument("--path", required=True)
    t.add_argument("--split", default="train")
    t.set_defaults(fn=cmd_make_txt)
    ft = sub.add_parser("make-foggy-txt")
    ft.add_argument("--path", required=True)
    ft.add_argument("--split", default="train")
    ft.add_argument("--betas", nargs="*", default=["0.005", "0.01", "0.02"])
    ft.set_defaults(fn=cmd_make_foggy_txt)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

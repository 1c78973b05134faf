"""Synthetic tiny VOC dataset trees for end-to-end tests (SURVEY.md section 4)."""

import os
import xml.etree.ElementTree as ET

import numpy as np
from PIL import Image

CLASSES = ("truck", "car", "rider", "person", "train", "motorcycle", "bicycle", "bus")


def _write_xml(path, w, h, objects):
    root = ET.Element("annotation")
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "width").text = str(w)
    ET.SubElement(size, "height").text = str(h)
    ET.SubElement(size, "depth").text = "3"
    for name, (x1, y1, x2, y2) in objects:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = name
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        ET.SubElement(bb, "xmin").text = str(int(x1) + 1)  # VOC 1-indexed
        ET.SubElement(bb, "ymin").text = str(int(y1) + 1)
        ET.SubElement(bb, "xmax").text = str(int(x2))
        ET.SubElement(bb, "ymax").text = str(int(y2))
    ET.ElementTree(root).write(path)


def make_voc_dataset(root, split="train", num_images=4, hw=(80, 120), num_classes=8,
                     seed=0, boxes_per_image=3):
    """Create a VOC tree: JPEGImages/, Annotations/, ImageSets/Main/{split}.txt.

    Images are wide (w > h) random noise with a few bright rectangles matching the
    GT boxes, so a detector can actually overfit in a few dozen steps.
    """
    rng = np.random.RandomState(seed)
    h, w = hw
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    ids = []
    for i in range(num_images):
        fid = f"{seed:02d}{i:04d}"
        ids.append(fid)
        img = rng.randint(0, 80, (h, w, 3)).astype(np.uint8)
        objects = []
        for _ in range(boxes_per_image):
            bw = rng.randint(max(8, w // 8), w // 3)
            bh = rng.randint(max(8, h // 8), h // 3)
            x1 = rng.randint(0, w - bw)
            y1 = rng.randint(0, h - bh)
            cls = CLASSES[rng.randint(num_classes)]
            img[y1:y1 + bh, x1:x1 + bw] = rng.randint(170, 255, 3)
            objects.append((cls, (x1, y1, x1 + bw, y1 + bh)))
        Image.fromarray(img).save(os.path.join(root, "JPEGImages", fid + ".jpg"))
        _write_xml(os.path.join(root, "Annotations", fid + ".xml"), w, h, objects)
    with open(os.path.join(root, "ImageSets", "Main", split + ".txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return root

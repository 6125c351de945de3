"""COCO-format detection dataset — json loading without pycocotools.

Capability of the reference's COCO plumbing (`mask-rcnn.pytorch/lib/
datasets/json_dataset.py`, `Mask_RCNN/samples/coco/coco.py`): parse a
COCO-style annotation json, expose per-image boxes / contiguous class ids /
instance masks. Polygon segmentations are rasterized with an even-odd
scanline fill (numpy); RLE masks (`counts` lists) are decoded directly.

No network, no pycocotools: fixtures for tests are generated synthetically
(`tests/test_coco.py`), and real COCO directories work when present.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from ..utils.io import read_image

__all__ = ["COCODetection", "rasterize_polygon", "decode_rle"]


def rasterize_polygon(poly: np.ndarray, h: int, w: int) -> np.ndarray:
    """Even-odd scanline fill of an (N, 2) [x, y] polygon → (h, w) bool."""
    mask = np.zeros((h, w), bool)
    xs, ys = poly[:, 0], poly[:, 1]
    n = len(poly)
    for row in range(int(np.floor(ys.min())), int(np.ceil(ys.max())) + 1):
        if not 0 <= row < h:
            continue
        yc = row + 0.5
        crossings = []
        for i in range(n):
            x0, y0 = xs[i], ys[i]
            x1, y1 = xs[(i + 1) % n], ys[(i + 1) % n]
            if (y0 <= yc < y1) or (y1 <= yc < y0):
                t = (yc - y0) / (y1 - y0)
                crossings.append(x0 + t * (x1 - x0))
        crossings.sort()
        for a, b in zip(crossings[::2], crossings[1::2]):
            lo = max(int(np.ceil(a - 0.5)), 0)
            hi = min(int(np.floor(b - 0.5)) + 1, w)
            if hi > lo:
                mask[row, lo:hi] = True
    return mask


def decode_rle(counts, h: int, w: int) -> np.ndarray:
    """Uncompressed COCO RLE (column-major runs) → (h, w) bool."""
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in counts:
        flat[pos : pos + c] = val
        pos += c
        val = not val
    return flat.reshape(w, h).T


@dataclass
class COCODetection:
    """COCO-style dataset: `root/` images + `ann_file` json.

    Category ids are remapped to contiguous 1..K (0 = background), the
    standard Detectron convention (`json_dataset.py`
    `_class_to_coco_ind` inverse).
    """

    root: str
    ann_file: str
    max_items: int | None = None

    def __post_init__(self):
        with open(self.ann_file) as f:
            data = json.load(f)
        self.categories = sorted(c["id"] for c in data.get("categories", []))
        self.cat_to_contiguous = {c: i + 1 for i, c in enumerate(self.categories)}
        self.class_names = {
            self.cat_to_contiguous[c["id"]]: c.get("name", str(c["id"]))
            for c in data.get("categories", [])
        }
        self.images = {im["id"]: im for im in data["images"]}
        self.anns_by_image: dict = {}
        for ann in data.get("annotations", []):
            if ann.get("iscrowd", 0):
                continue
            self.anns_by_image.setdefault(ann["image_id"], []).append(ann)
        self.ids = sorted(self.images)
        if self.max_items:
            self.ids = self.ids[: self.max_items]

    @property
    def num_classes(self) -> int:
        return len(self.categories) + 1  # + background

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx: int):
        info = self.images[self.ids[idx]]
        h, w = info["height"], info["width"]
        path = Path(self.root) / info["file_name"]
        img = read_image(path) if path.exists() else np.zeros((h, w, 3))
        boxes, classes, masks = [], [], []
        for ann in self.anns_by_image.get(info["id"], []):
            x, y, bw, bh = ann["bbox"]  # COCO xywh
            boxes.append([x, y, x + bw, y + bh])
            classes.append(self.cat_to_contiguous[ann["category_id"]])
            seg = ann.get("segmentation")
            if isinstance(seg, list) and seg:
                m = np.zeros((h, w), bool)
                for poly in seg:
                    pts = np.asarray(poly, float).reshape(-1, 2)
                    m |= rasterize_polygon(pts, h, w)
                masks.append(m)
            elif isinstance(seg, dict) and isinstance(seg.get("counts"), list):
                masks.append(decode_rle(seg["counts"], h, w))
            else:
                m = np.zeros((h, w), bool)
                m[int(y) : int(y + bh), int(x) : int(x + bw)] = True
                masks.append(m)
        return {
            "image": img,
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "classes": np.asarray(classes, np.int32),
            "masks": np.stack(masks) if masks else np.zeros((0, h, w), bool),
            "image_id": info["id"],
        }

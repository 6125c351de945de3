"""Scaled COCO-format detection run — exercises the FILE-FORMAT path
(json annotations + on-disk images → `data.coco.COCODetection` →
`train_detection_coco`) at scale, the protocol of the reference's
`samples/coco/coco.py` train/eval loop. No real COCO images exist in this
zero-egress container (tracked in BASELINE.md), so the images are the
procedural shapes renderer exported to a genuine COCO tree (pngs + json
with polygon segmentations); the result is a pipeline/scale validation,
NOT a claim of COCO-benchmark parity.

Usage: python tools/train_coco_scaled.py [--steps 3000] [--items 120]
       [--device tpu] [--out COCO_SCALED.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def export_coco_tree(out_dir: str, num_items: int, size: int, seed: int):
    """Render shapes items into a COCO directory (images/ + ann.json)."""
    import numpy as np
    from PIL import Image

    from depth_estimation_tpu.data.shapes import ShapesDetection

    ds = ShapesDetection(num_items=num_items, h=size, w=size, max_shapes=3,
                         seed=seed)
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    cat_ids = set()
    for i in range(num_items):
        item = ds[i]
        img = np.clip(np.asarray(item["image"]), 0, 1)
        fn = f"{i:05d}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(img_dir, fn))
        images.append({"id": i + 1, "file_name": fn,
                       "height": size, "width": size})
        for box, cls, mask in zip(item["boxes"], item["classes"],
                                  item["masks"]):
            x1, y1, x2, y2 = [float(v) for v in box]
            ys, xs = np.where(np.asarray(mask) > 0.5)
            if len(xs) == 0:
                continue
            # tight polygon = the mask's bounding contour as a rectangle
            # fan (COCO polygon format); rasterizes back to ≈ the mask's
            # bbox extent — sufficient for the mask-head training contract
            poly = [float(xs.min()), float(ys.min()),
                    float(xs.max() + 1), float(ys.min()),
                    float(xs.max() + 1), float(ys.max() + 1),
                    float(xs.min()), float(ys.max() + 1)]
            cat_ids.add(int(cls))
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": int(cls),
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "segmentation": [poly], "iscrowd": 0,
                "area": float((x2 - x1) * (y2 - y1)),
            })
            ann_id += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c, "name": f"class{c}"}
                          for c in sorted(cat_ids)]}
    ann_path = os.path.join(out_dir, "ann.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return img_dir, ann_path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--items", type=int, default=120)
    ap.add_argument("--holdout", type=int, default=10)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--data-dir", default="/tmp/det_coco_scaled")
    ap.add_argument("--out", default=os.path.join(ROOT, "COCO_SCALED.json"))
    args = ap.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        for flag, val in (("jax_compilation_cache_dir", "/tmp/det_jax_ccache"),
                          ("jax_persistent_cache_min_compile_time_secs", 0.0),
                          ("jax_persistent_cache_min_entry_size_bytes", 0)):
            try:
                jax.config.update(flag, val)
            except Exception:
                pass

    root, ann = export_coco_tree(args.data_dir, args.items, args.size,
                                 args.seed)
    from depth_estimation_tpu.train.experiments import train_detection_coco

    t0 = time.time()
    params, hist = train_detection_coco(
        root, ann, num_steps=args.steps, size=args.size,
        lr=args.lr, seed=args.seed, holdout=args.holdout,
        model_kwargs=dict(blocks=(2, 2, 2, 2), base_width=64, fpn_dim=128,
                          num_proposals=128, num_detections=32,
                          score_thresh=-1.0),
    )
    result = {
        "config": {"steps": args.steps, "items": args.items,
                   "holdout": args.holdout, "size": args.size,
                   "format": "COCO json + png tree (procedural shapes "
                             "renders — no real COCO in this container, "
                             "see BASELINE.md)"},
        "loss_first": round(hist["loss"][0], 4),
        "loss_last": round(hist["loss"][-1], 4),
        "loss_curve_every25": [round(l, 4) for l in hist["loss"][::25]],
        "heldout_map50": round(hist["map50"], 4),
        "heldout_mask_iou": round(hist.get("mask_iou", float("nan")), 4),
        "wall_s": round(time.time() - t0, 1),
        "device": args.device,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "loss_curve_every25"}))


if __name__ == "__main__":
    main()

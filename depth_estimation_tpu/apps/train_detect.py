"""CLI: train the detection family (shapes by default, COCO-format if given).

  python -m depth_estimation_tpu.apps.train_detect [--steps 200]
      [--coco-root imgs/ --coco-ann ann.json] [--keypoints]
      [--holdout N] [--out params.msgpack]

Trains MaskRCNN with the full multi-task loss — RPN objectness/box + ROI
class/box + mask BCE (+ keypoint CE with --keypoints) — and reports
mAP@0.5 and ROI-frame mask IoU, on held-out items when --holdout is set.
Without a COCO dataset it uses the procedural shapes fixtures (the
reference's shapes-train protocol).
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--items", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--holdout", type=int, default=2,
                    help="evaluate on N held-out items (0 = in-domain "
                         "training-set eval; default ON — the reference's "
                         "train/val protocol)")
    ap.add_argument("--keypoints", action="store_true",
                    help="train the keypoint branch too (shapes only)")
    ap.add_argument("--coco-root", default=None)
    ap.add_argument("--coco-ann", default=None)
    ap.add_argument("--out", default=None, help="flax msgpack params path")
    ap.add_argument("--device", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    from ..train.experiments import train_detection_coco, train_detection_shapes

    if args.coco_root and args.coco_ann:
        params, hist = train_detection_coco(
            args.coco_root, args.coco_ann, num_steps=args.steps,
            size=args.size, lr=args.lr, max_items=args.items or None,
            holdout=args.holdout,
        )
    else:
        params, hist = train_detection_shapes(
            num_steps=args.steps, num_items=args.items, h=args.size,
            lr=args.lr, holdout=args.holdout, with_keypoints=args.keypoints,
        )
    if args.out:
        import flax.serialization as ser

        with open(args.out, "wb") as f:
            f.write(ser.to_bytes(params))
    print(
        json.dumps(
            {
                "steps": args.steps,
                "loss_first": hist["loss"][0],
                "loss_last": hist["loss"][-1],
                "map50": hist["map50"],
                "mask_iou": hist.get("mask_iou"),
                "out": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

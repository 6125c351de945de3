"""CLI: object detection + instance masks (+ optional mask-guided depth).

  python -m depth_estimation_tpu.apps.detect --image in.png --out det.png
      [--params params.msgpack] [--right right.png --depth-out depth.pfm]

Runs the MaskRCNN family model (random weights unless --params gives a
flax msgpack checkpoint), draws detections, and — when a right view is
supplied — composites per-instance phase-correlation disparities into a
segment depth map (the `POC.ipynb` pipeline end-to-end).
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", default=None, help="detections PNG")
    ap.add_argument("--params", default=None, help="flax msgpack checkpoint")
    ap.add_argument("--right", default=None, help="right view for mask depth")
    ap.add_argument("--depth-out", default=None)
    ap.add_argument("--splash", default=None,
                    help="color-splash PNG (gray except detected instances)")
    ap.add_argument("--rle-out", default=None,
                    help="write instance masks as submission-format RLE lines")
    ap.add_argument("--num-classes", type=int, default=81)
    ap.add_argument("--detections", type=int, default=16)
    ap.add_argument("--device", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from ..models.detection.rcnn import MaskRCNN
    from ..utils.io import read_image, write_pfm
    from ..utils.visualize import (
        color_splash,
        draw_detections,
        paste_roi_masks,
        save_image,
    )

    img = jnp.asarray(read_image(args.image), jnp.float32)
    model = MaskRCNN(
        num_classes=args.num_classes,
        num_detections=args.detections,
        blocks=(2, 2, 2, 2),
        fpn_dim=128,
    )
    if args.params:
        import flax.serialization as ser

        with open(args.params, "rb") as f:
            params = model.init(jax.random.PRNGKey(0), img)
            params = ser.from_bytes(params, f.read())
    else:
        params = model.init(jax.random.PRNGKey(0), img)
    out = jax.jit(model.apply)(params, img)

    result = {
        "num_valid": int(np.asarray(out["valid"]).sum()),
        "scores": np.asarray(out["scores"]).round(3).tolist(),
    }
    if args.out:
        panel = draw_detections(
            np.asarray(img), np.asarray(out["boxes"]), np.asarray(out["classes"]),
            masks=np.asarray(out["masks"]), valid=np.asarray(out["valid"]),
        )
        save_image(args.out, panel)
        result["out"] = args.out

    h, w = img.shape[:2]
    full = None
    if (args.right and args.depth_out) or args.splash or args.rle_out:
        full = paste_roi_masks(
            np.asarray(out["boxes"]), np.asarray(out["masks"]), h, w,
            valid=np.asarray(out["valid"]),
        )

    if args.splash:
        save_image(args.splash, color_splash(np.asarray(img), full))
        result["splash"] = args.splash

    if args.rle_out:
        from ..data.coco import masks_to_submission

        with open(args.rle_out, "w") as f:
            f.write(masks_to_submission(
                args.image, full, np.asarray(out["scores"])) + "\n")
        result["rle_out"] = args.rle_out

    if args.right and args.depth_out:
        from ..models.maskdepth import composite_mask_depth

        right = jnp.asarray(read_image(args.right), jnp.float32)
        depth = np.asarray(
            composite_mask_depth(img, right, jnp.asarray(full, jnp.float32))
        )
        write_pfm(args.depth_out, depth)
        result["depth_out"] = args.depth_out
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""CLI: CRF-guided depth super-resolution.

  python -m depth_estimation_tpu.apps.upsample \
      --disp low.pfm --image full.png --out up.pfm [--factor 16]

The `CRFdepthUpsampler` task (`crf/mb_stereo_crf.py:138-163`): bilinear
upsample a low-res disparity to the guide image's resolution, then refine
with the image-guided CRF. If --gt is given prints masked L1.
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--disp", required=True, help="low-res disparity (PFM)")
    ap.add_argument("--image", required=True, help="full-res guide image")
    ap.add_argument("--out", default=None)
    ap.add_argument("--gt", default=None)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--radius", type=int, default=5)
    ap.add_argument("--labels", type=int, default=18)
    ap.add_argument("--device", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from ..models.refiner import upsampler_init, upsampler_apply
    from ..train.metrics import masked_l1
    from ..utils.io import read_image, read_pfm, write_pfm

    disp_lo = jnp.asarray(read_pfm(args.disp), jnp.float32)
    img = jnp.asarray(read_image(args.image), jnp.float32)
    params = upsampler_init()
    out = upsampler_apply(
        params, disp_lo, img, niters=args.iters, r=args.radius, num_labels=args.labels
    )
    disp = np.asarray(out, np.float32)
    result = {"shape": list(disp.shape)}
    if args.out:
        write_pfm(args.out, disp)
        result["out"] = args.out
    if args.gt:
        gt = jnp.asarray(read_pfm(args.gt), jnp.float32)
        result["masked_l1"] = float(masked_l1(out, gt))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

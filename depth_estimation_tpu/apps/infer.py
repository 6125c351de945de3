"""CLI: stereo pair → disparity map.

The `DenseCrf.ipynb` pipeline as a command (SURVEY.md §7.11 'infer'):

  python -m depth_estimation_tpu.apps.infer \
      --left imL.png --right imR.png --out disp.pfm \
      [--labels 16] [--iters 5] [--backend lattice|dense] [--device tpu|cpu]

Writes the refined disparity as PFM (and optionally a PNG preview) and
prints EPE/bad-2.0 if --gt is given (PGM GT uses the Tsukuba /16
convention when --gt-scale 16 is passed).
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--left", required=True)
    ap.add_argument("--right", required=True)
    ap.add_argument("--out", default=None, help="output PFM path")
    ap.add_argument("--preview", default=None, help="optional PNG preview path")
    ap.add_argument("--gt", default=None, help="ground-truth PFM/PGM for metrics")
    ap.add_argument("--gt-scale", type=float, default=1.0, help="divide GT by this")
    ap.add_argument("--labels", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--window", type=int, default=9)
    ap.add_argument("--sigma-color", type=float, default=0.1)
    ap.add_argument("--sigma-pos", type=float, default=0.1)
    ap.add_argument("--backend", default="lattice", choices=["lattice", "dense"])
    ap.add_argument("--device", default=None)
    ap.add_argument("--fast", action="store_true",
                    help="calibrate this pair first (tight measured lattice "
                         "capacity + tiled MXU splat/slice + pinned plan "
                         "sort) — the serving-speed path; default is the "
                         "safe uncalibrated config")
    args = ap.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from ..models.pipeline import CRFStereoConfig, crf_stereo_infer
    from ..train.metrics import bad_pixel_ratio, epe
    from ..utils.io import read_image, read_pfm, read_pgm, write_pfm

    left = jnp.asarray(read_image(args.left), jnp.float32)
    right = jnp.asarray(read_image(args.right), jnp.float32)
    cfg = CRFStereoConfig(
        num_disp=args.labels,
        window_size=args.window,
        sigma_color=args.sigma_color,
        sigma_pos=args.sigma_pos,
        niters=args.iters,
        backend=args.backend,
    )
    if args.fast:
        from ..models.pipeline import calibrate_capacity

        cfg = calibrate_capacity(left, cfg, headroom=3.0, tiled=True)
    out = crf_stereo_infer(left, right, cfg)
    disp = np.asarray(out["disparity"], np.float32)

    result = {"shape": list(disp.shape), "backend": args.backend}
    if args.out:
        write_pfm(args.out, disp)
        result["out"] = args.out
    if args.preview:
        from PIL import Image

        norm = (disp - disp.min()) / max(disp.max() - disp.min(), 1e-9)
        Image.fromarray((norm * 255).astype(np.uint8)).save(args.preview)
        result["preview"] = args.preview
    if args.gt:
        gt = read_pgm(args.gt) if args.gt.endswith(".pgm") else read_pfm(args.gt)
        gt = np.asarray(gt, np.float64) / args.gt_scale
        gt_j = jnp.asarray(gt, jnp.float32)
        mask = (gt_j > 0).astype(jnp.float32)
        result["epe"] = float(epe(out["disparity"], gt_j, mask))
        result["bad2"] = float(bad_pixel_ratio(out["disparity"], gt_j, 2.0, mask))
        result["epe_unary"] = float(epe(out["disparity_unary"], gt_j, mask))
        result["bad2_unary"] = float(
            bad_pixel_ratio(out["disparity_unary"], gt_j, 2.0, mask)
        )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

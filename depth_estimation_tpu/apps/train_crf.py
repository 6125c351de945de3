"""CLI: train the dense CRF on a stereo pair (trainableDenseCRF protocol).

  python -m depth_estimation_tpu.apps.train_crf \
      --left imL.png --right imR.png --gt truedisp.pgm --gt-scale 16 \
      [--steps 300] [--lr 3e-2] [--out params.npz]

Adam on masked MSE against GT, end-to-end through the lattice filter
(`Experiments/trainableDenseCRF.ipynb` cells 8-21). Prints a JSON summary
with before/after MSE and the learned scales.
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--left", required=True)
    ap.add_argument("--right", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--gt-scale", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=3e-2)
    ap.add_argument("--labels", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=None, help="save learned params (.npz)")
    ap.add_argument("--device", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import numpy as np

    from ..train.experiments import train_tsukuba_crf
    from ..utils.io import read_image, read_pfm, read_pgm

    left = read_image(args.left)
    right = read_image(args.right)
    gt = read_pgm(args.gt) if args.gt.endswith(".pgm") else read_pfm(args.gt)
    gt = np.asarray(gt, np.float64) / args.gt_scale

    params, hist = train_tsukuba_crf(
        left.astype(np.float32),
        right.astype(np.float32),
        gt.astype(np.float32),
        num_steps=args.steps,
        lr=args.lr,
        num_disp=args.labels,
        niters=args.iters,
    )
    if args.out:
        flat = {}
        def add(prefix, tree):
            for k, v in tree.items():
                if isinstance(v, dict):
                    add(f"{prefix}{k}.", v)
                else:
                    flat[f"{prefix}{k}"] = np.asarray(v)
        add("", params)
        np.savez(args.out, **flat)

    print(
        json.dumps(
            {
                "steps": args.steps,
                "mse_before": hist["mse_before"],
                "mse_after": hist["mse_after"],
                "final_loss": hist["loss"][-1],
                "learned_s_ij": float(np.exp(np.asarray(params["log_s_ij"]))),
                "learned_s_rgb": float(np.exp(np.asarray(params["log_s_rgb"]))),
                "learned_gamma": float(np.asarray(params["mu"]["gamma"])),
                "out": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

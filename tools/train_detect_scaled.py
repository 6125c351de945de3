"""Above-toy-scale detection training with an imported (grafted) backbone.

Round-3 verdict: every committed detection run used 64×64 images with a
(1,1,1,1)-block, 32-dim-FPN model, and `graft_backbone` was only ever
shape-tested. This run is the missing evidence at realistic model scale:

  * ResNet body blocks ≥ (2,2,2,2), bottleneck base_width 64, FPN 128 —
    the reference's `e2e_mask_rcnn-R-50-FPN` architecture family at
    ResNet-18 depth (`mask-rcnn.pytorch/lib/modeling/ResNet.py:17-116`);
  * the body is IMPORTED: a synthetic torchvision-layout ResNet
    checkpoint (He-init kernels + randomized BN statistics — no
    pretrained weights exist in this zero-egress image) goes through
    `utils.weights.torch_resnet_params` (BN folding) and
    `utils.weights.graft_backbone` into a fresh MaskRCNN tree — the
    reference's load-weights → fine-tune flow (`mrcnn/model.py:2103-2160`);
  * 128×128 images, full multi-task loss (RPN + ROI cls/box + mask BCE),
    held-out mAP@0.5 + mask IoU (never-trained items, disjoint seed).

Writes DETECT_SCALED.json at the repo root:
    python tools/train_detect_scaled.py [--steps 300] [--size 128]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BLOCKS = (2, 2, 2, 2)
BASE_WIDTH = 64
FPN_DIM = 128


def synth_torch_resnet_sd(blocks=BLOCKS, width=BASE_WIDTH, seed=0):
    """Synthetic torchvision-layout ResNet state_dict (numpy): He-init
    conv kernels, randomized BatchNorm statistics so the import path's
    BN folding is exercised with non-trivial scales."""
    import numpy as np

    rng = np.random.RandomState(seed)
    sd = {}

    def conv(name, cout, cin, k):
        fan_in = cin * k * k
        sd[name + ".weight"] = rng.randn(cout, cin, k, k).astype(
            np.float32
        ) * np.sqrt(2.0 / fan_in)

    def bn(name, c):
        sd[name + ".weight"] = (1.0 + 0.2 * rng.randn(c)).astype(np.float32)
        sd[name + ".bias"] = (0.2 * rng.randn(c)).astype(np.float32)
        sd[name + ".running_mean"] = (0.5 * rng.randn(c)).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)

    conv("conv1", width, 3, 7)
    bn("bn1", width)
    cin, w = width, width
    for s, n in enumerate(blocks):
        for j in range(n):
            p = f"layer{s + 1}.{j}"
            conv(p + ".conv1", w, cin, 1)
            bn(p + ".bn1", w)
            conv(p + ".conv2", w, w, 3)
            bn(p + ".bn2", w)
            conv(p + ".conv3", w * 4, w, 1)
            bn(p + ".bn3", w * 4)
            if cin != w * 4 or (s > 0 and j == 0):
                conv(p + ".downsample.0", w * 4, cin, 1)
                bn(p + ".downsample.1", w * 4)
            cin = w * 4
        w *= 2
    return sd


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--items", type=int, default=16)
    ap.add_argument("--holdout", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--grad-clip", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", default="cpu",
                    help="'cpu' (no relay) or 'tpu'/'' for the default "
                         "axon backend — detection steps are ~100x faster "
                         "on chip; the compile rides the wedge-retry of "
                         "the caller")
    ap.add_argument("--save", default=None,
                    help="write final params (flax msgpack) here")
    ap.add_argument("--resume", default=None,
                    help="continue training from a saved params msgpack "
                         "(skips the graft + heads-frozen phase)")
    ap.add_argument("--out", default=os.path.join(ROOT, "DETECT_SCALED.json"))
    args = ap.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")  # no relay dial
    else:
        for flag, val in (("jax_compilation_cache_dir", "/tmp/det_jax_ccache"),
                          ("jax_persistent_cache_min_compile_time_secs", 0.0),
                          ("jax_persistent_cache_min_entry_size_bytes", 0)):
            try:
                jax.config.update(flag, val)
            except Exception:
                pass
    import jax.numpy as jnp

    from depth_estimation_tpu.data.shapes import NUM_CLASSES, ShapesDetection
    from depth_estimation_tpu.models.detection.rcnn import MaskRCNN
    from depth_estimation_tpu.train.experiments import train_detection_items
    from depth_estimation_tpu.utils import weights as W

    model_kwargs = dict(
        blocks=BLOCKS, fpn_dim=FPN_DIM, base_width=BASE_WIDTH,
        backbone_norm="affine",
        stride_1x1=W.resnet_import_kwargs("torch")["stride_1x1"],
        num_proposals=128, num_detections=32, score_thresh=-1.0,
        num_classes=NUM_CLASSES,
    )

    # import + graft the synthetic pretrained-layout backbone
    sd = synth_torch_resnet_sd(seed=args.seed + 7)
    imported = W.torch_resnet_params(sd, blocks=BLOCKS)
    model = MaskRCNN(**model_kwargs)
    img0 = jnp.zeros((args.size, args.size, 3), jnp.float32)
    fresh = model.init(jax.random.PRNGKey(args.seed), img0, train=True)
    grafted = W.graft_backbone(fresh, imported)

    ds = ShapesDetection(num_items=args.items, h=args.size, w=args.size,
                         max_shapes=2, seed=args.seed)
    items = [ds.padded(i) for i in range(args.items)]
    val = ShapesDetection(num_items=args.holdout, h=args.size, w=args.size,
                          max_shapes=2, seed=args.seed + 1000)
    eval_items = [val.padded(i) for i in range(args.holdout)]

    # Two-phase schedule — the reference's staged protocol
    # (`samples/coco/coco.py` trains layers='heads' then fine-tunes;
    # `mrcnn/model.py:2284-2385`): heads on the frozen imported body
    # first, then all layers at lower LR. --resume skips straight to the
    # all-layers phase from a saved checkpoint.
    t0 = time.time()
    if args.resume:
        import flax.serialization as ser

        with open(args.resume, "rb") as f:
            start = ser.from_bytes(grafted, f.read())
        hist1 = {"loss": []}
        params, hist = train_detection_items(
            items, NUM_CLASSES, num_steps=args.steps, lr=args.lr / 3,
            seed=args.seed + 1, model_kwargs=model_kwargs,
            eval_items=eval_items, init_params=start, loss_breakdown=True,
            grad_clip=args.grad_clip,
        )
    else:
        heads_steps = args.steps // 2
        params, hist1 = train_detection_items(
            items, NUM_CLASSES, num_steps=heads_steps, lr=args.lr,
            seed=args.seed, model_kwargs=model_kwargs, eval_items=eval_items,
            init_params=grafted, loss_breakdown=True, grad_clip=args.grad_clip,
            freeze_backbone=True,
        )
        params, hist = train_detection_items(
            items, NUM_CLASSES, num_steps=args.steps - heads_steps,
            lr=args.lr / 3, seed=args.seed, model_kwargs=model_kwargs,
            eval_items=eval_items, init_params=params, loss_breakdown=True,
            grad_clip=args.grad_clip,
        )
    wall = time.time() - t0

    losses = hist1["loss"] + hist["loss"]
    result = {
        "config": {
            "blocks": list(BLOCKS), "base_width": BASE_WIDTH,
            "fpn_dim": FPN_DIM, "image": args.size, "steps": args.steps,
            "train_items": args.items, "holdout": args.holdout,
            "backbone": "grafted synthetic torchvision checkpoint "
                        "(BN-folded import)",
        },
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "loss_curve_every25": [round(l, 4) for l in losses[::25]],
        "heldout_map50": round(hist["map50"], 4),
        "heldout_mask_iou": round(hist.get("mask_iou", float("nan")), 4),
        "final_loss_parts": {k: round(v, 4)
                             for k, v in hist["parts"][-1].items()},
        "wall_s": round(wall, 1),
        "device": args.device or "default",
        "resumed_from": args.resume,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    if args.save:
        import flax.serialization as ser

        with open(args.save, "wb") as f:
            f.write(ser.to_bytes(params))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

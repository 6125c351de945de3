"""Canonical training experiments — the reference notebooks as functions.

- `train_tsukuba_crf`: the trainable dense CRF of
  `Experiments/trainableDenseCRF.ipynb` (cells 8-21): learn the guide
  scales, feature projection, and Charbonnier compatibility by Adam on the
  masked MSE against Tsukuba ground truth, differentiating end-to-end
  through the permutohedral lattice filter (BASELINE config #3).
- `train_upsampler`: the depth-upsampling run of
  `crf/mb_stereo_crf.py:165-181` on Middlebury 2005 (masked L1).

Each returns (final params, history dict) and is deliberately scale-
parameterized so tests can run a small crop while the full experiment
matches the reference protocol (300 steps, lr 3e-2, Adam).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..crf.compat import charb_apply, charb_init
from ..crf.meanfield import crf_as_rnn
from ..models.features import random_features
from ..ops.costvolume import cost_volume, expected_disparity
from ..ops.permutohedral import build_plan, lattice_filter_planned
from ..crf.guides import pixel_coords
from ..train.metrics import masked_mse

__all__ = [
    "trainable_crf_init",
    "trainable_crf_forward",
    "train_tsukuba_crf",
    "train_detection_items",
    "train_detection_shapes",
    "train_detection_coco",
    "train_detection_shapes_batched",
    "evaluate_detection",
    "train_uncertainty",
    "train_upsampler",
]


def trainable_crf_init(
    key, d_feat: int = 16, d_proj: int = 3, gamma: float = 0.05, dtype=jnp.float32
) -> dict:
    """Params of the trainable dense CRF (`trainableDenseCRF.ipynb` cell 8):
    a linear projection of CNN features into extra guide dims, trainable
    position/color scales, and the Charbonnier compatibility."""
    scale = jnp.asarray(1.0 / np.sqrt(d_feat), dtype)
    return {
        "proj_w": jax.random.normal(key, (d_feat, d_proj), dtype) * scale,
        "proj_b": jnp.zeros((d_proj,), dtype),
        "log_s_ij": jnp.log(jnp.asarray(0.1, dtype)),
        "log_s_rgb": jnp.log(jnp.asarray(0.1, dtype)),
        "log_s_feat": jnp.log(jnp.asarray(10.0, dtype)),
        "mu": charb_init(gamma, dtype),
    }


def trainable_crf_forward(
    params: dict,
    logits: jax.Array,
    img: jax.Array,
    feats: jax.Array,
    niters: int = 5,
) -> jax.Array:
    """Refined logits; gradients flow to guide scales/projection through the
    lattice custom VJP (the 4-filter identity)."""
    h, w, L = logits.shape
    ij = pixel_coords(h, w, img.dtype)
    projected = feats @ params["proj_w"] + params["proj_b"]
    guide = jnp.concatenate(
        [
            ij / jnp.exp(params["log_s_ij"]),
            img / jnp.exp(params["log_s_rgb"]),
            projected / jnp.exp(params["log_s_feat"]),
        ],
        axis=-1,
    )
    ref = guide.reshape(h * w, -1)
    cap = min(1 << (2 * h * w - 1).bit_length(), h * w * (ref.shape[1] + 1))
    plan = build_plan(jax.lax.stop_gradient(ref), max_vertices=cap)
    plan = jax.lax.optimization_barrier(plan)  # no per-iter remat (r5)

    def message_fn(Q):
        flat = Q.reshape(h * w, L)
        out = lattice_filter_planned(flat, ref, plan) - flat
        return out.reshape(h, w, L)

    compat_fn = lambda Q: charb_apply(params["mu"], Q)
    return crf_as_rnn(logits, message_fn, compat_fn, niters)


def train_tsukuba_crf(
    left: np.ndarray,
    right: np.ndarray,
    gt: np.ndarray,
    num_steps: int = 300,
    lr: float = 3e-2,
    num_disp: int = 16,
    niters: int = 5,
    d_feat: int = 16,
    seed: int = 0,
    guidance: str = "random",
    guidance_params=None,
):
    """Adam training of the CRF hyperparameters on one stereo pair
    (masked MSE on gt>0 pixels, `trainableDenseCRF.ipynb` cell 14).

    `guidance` picks the semantic features feeding the trainable guide
    (the reference projects pretrained VGG16 features into the guide,
    `trainableDenseCRF.ipynb` cell 8 + `crf/features.py:12-22`):
      - 'random': seeded random-projection features (training-free).
      - 'cnn': a `FeatureCNN` trained JOINTLY with the CRF — gradients
        flow from the masked MSE through the lattice VJP into the conv
        weights (goes beyond the reference, which froze its extractor).
      - 'vgg': `VGG16Features` with `guidance_params` (e.g. imported via
        `utils.weights.torch_vgg16_params`), frozen — the reference's
        protocol exactly. With no params it falls back to an init-seeded
        VGG (random multi-scale projections) and emits a UserWarning —
        that mode is NOT the reference's semantic-guidance protocol.

    Returns (params, history) with history['loss'] per step and
    before/after masked MSE of the decoded disparity.
    """
    key = jax.random.PRNGKey(seed)
    left_j = jnp.asarray(left, jnp.float32)
    gt_j = jnp.asarray(gt, jnp.float32)
    mask = (gt_j > 0).astype(jnp.float32)

    E0 = cost_volume(left_j, jnp.asarray(right, jnp.float32), num_disp, 9)
    logits = -E0

    feats = None
    feat_fn = None
    if guidance == "random":
        feats = random_features(left_j, out_dim=d_feat)
    elif guidance == "cnn":
        from ..models.features import FeatureCNN

        cnn = FeatureCNN(out_dim=d_feat)
        cnn_params = cnn.init(jax.random.PRNGKey(seed + 1), left_j)
        feat_fn = lambda cp: cnn.apply(cp, left_j)
    elif guidance == "vgg":
        from ..models.features import VGG16Features

        vgg = VGG16Features()
        if guidance_params is None:
            # The reference protocol (`crf/features.py:12-22`) uses
            # torchvision's PRETRAINED VGG16; random-init taps are NOT
            # semantic guidance and results must not be read as the
            # reference's. Warn loudly rather than silently substituting.
            import warnings

            warnings.warn(
                "guidance='vgg' without guidance_params runs a RANDOM-init "
                "VGG16 — pass params imported via "
                "utils.weights.torch_vgg16_params for the reference "
                "protocol (pretrained weights are not bundled).",
                UserWarning,
                stacklevel=2,
            )
            guidance_params = vgg.init(jax.random.PRNGKey(seed + 1), left_j)
        full = vgg.apply(guidance_params, left_j)
        # project the 960-d tap stack to d_feat with a fixed seeded
        # projection; the trainable proj_w inside the CRF re-mixes it
        # (cell 8's Linear(64→5) plays that role in the reference).
        key_p = jax.random.PRNGKey(seed + 2)
        proj = jax.random.normal(key_p, (full.shape[-1], d_feat), jnp.float32)
        feats = full @ (proj / jnp.sqrt(jnp.asarray(full.shape[-1], jnp.float32)))
        feats = (feats - feats.mean((0, 1))) / (feats.std((0, 1)) + 1e-6)
    else:
        raise ValueError(f"unknown guidance {guidance!r}")

    params = trainable_crf_init(key, d_feat=d_feat)
    if feat_fn is not None:
        params = {**params, "cnn": cnn_params}

    def loss_fn(p):
        f = feat_fn(p["cnn"]) if feat_fn is not None else feats
        crf_p = {k: v for k, v in p.items() if k != "cnn"}
        refined = trainable_crf_forward(crf_p, logits, left_j, f, niters)
        disp = expected_disparity(refined)
        return masked_mse(disp, gt_j, mask)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    mse_before = float(loss_fn(params))
    history = {"loss": []}
    for _ in range(num_steps):
        params, opt_state, loss = step(params, opt_state)
        history["loss"].append(float(loss))
    history["mse_before"] = mse_before
    history["mse_after"] = float(loss_fn(params))
    return params, history


def train_detection_items(
    items,
    num_classes: int,
    num_steps: int = 50,
    lr: float = 1e-3,
    seed: int = 0,
    model_kwargs: dict | None = None,
    with_masks: bool | None = None,
    with_keypoints: bool = False,
    loss_breakdown: bool = False,
    eval_items=None,
    init_params=None,
    grad_clip: float | None = None,
    freeze_backbone: bool = False,
):
    """Core single-device detection train loop over fixed-shape items.

    Each item carries `image` (h, w, 3) plus padded GT
    (`boxes_padded`/`classes_padded`/`gt_valid`, and `masks_padded` /
    `keypoints_padded`+`kp_visible_padded` for the mask/keypoint branches)
    and unpadded `boxes`/`classes` for the mAP@0.5 eval at the end. One
    XLA program serves every item (static shapes).

    The loss is the reference's full multi-task sum — RPN objectness +
    RPN box + ROI class + ROI box + mask BCE (+ keypoint CE when
    `with_keypoints`), `Generalized_RCNN._forward` semantics
    (`mask-rcnn.pytorch/lib/modeling/model_builder.py:148-250`,
    `Mask_RCNN/mrcnn/model.py:1162-1192` mask term). `with_masks` defaults
    to whether items carry `masks_padded`. Returns (params, history).
    """
    import optax

    from ..models.detection.losses import (
        keypoint_targets, mask_loss, roi_losses, roi_mask_targets, rpn_losses,
    )
    from ..models.detection.rcnn import MaskRCNN, keypoint_loss
    from ..train.eval_detection import compute_ap

    if with_masks is None:
        with_masks = "masks_padded" in items[0]
    kwargs = dict(
        num_classes=num_classes, blocks=(1, 1, 1, 1), fpn_dim=32,
        num_proposals=32, num_detections=8, score_thresh=-1.0,
    )
    if with_keypoints:
        kwargs["num_keypoints"] = items[0]["keypoints_padded"].shape[1]
    kwargs.update(model_kwargs or {})
    model = MaskRCNN(**kwargs)
    key = jax.random.PRNGKey(seed)
    img0 = jnp.asarray(items[0]["image"], jnp.float32)
    params = model.init(key, img0, train=True)
    if init_params is not None:
        # fine-tune entry: caller supplies a full params tree (e.g. a
        # fresh init with `utils.weights.graft_backbone`-imported body —
        # the reference's load-weights → train flow, mrcnn/model.py:2103)
        params = init_params
    # the reference trainer clips gradients before every step
    # (`lib/utils/net_utils.py` clip_gradient, train_net_step.py) —
    # essential when fine-tuning an imported body whose folded BN scales
    # make early RPN/ROI regression gradients large
    opt = (
        optax.chain(optax.clip_by_global_norm(grad_clip), optax.adam(lr))
        if grad_clip
        else optax.adam(lr)
    )
    if freeze_backbone:
        # the reference's layers='heads' training phase (`mrcnn/model.py:
        # 2284-2385` layer-regex freezing): imported body stays fixed,
        # FPN/RPN/heads train.
        def _lbl(path, _):
            frozen = any(getattr(k, "key", None) == "ResNet_0" for k in path)
            return "frozen" if frozen else "train"

        labels = jax.tree_util.tree_map_with_path(_lbl, params)
        opt = optax.multi_transform(
            {"frozen": optax.set_to_zero(), "train": opt}, labels
        )
    opt_state = opt.init(params)

    def item_arrays(item):
        arrs = [
            jnp.asarray(item["image"], jnp.float32),
            jnp.asarray(item["boxes_padded"]),
            jnp.asarray(item["classes_padded"]),
            jnp.asarray(item["gt_valid"]),
            jnp.asarray(item["masks_padded"], jnp.float32) if with_masks else None,
        ]
        if with_keypoints:
            arrs += [
                jnp.asarray(item["keypoints_padded"], jnp.float32),
                jnp.asarray(item["kp_visible_padded"]),
            ]
        else:
            arrs += [None, None]
        return arrs

    def loss_fn(params, image, boxes, cls, valid, masks, kps, kp_vis):
        out = model.apply(
            params, image, train=True, gt_boxes=boxes, gt_valid=valid
        )
        rpn_cls, rpn_reg = rpn_losses(
            out["rpn_logits"], out["rpn_deltas"], out["anchors"], boxes, valid
        )
        roi_cls, roi_reg, tgt_cls, best_gt, fg = roi_losses(
            out["cls_scores"], out["cls_deltas"], out["proposals"],
            out["proposal_valid"], boxes, cls, valid,
        )
        parts = {"rpn_cls": rpn_cls, "rpn_reg": rpn_reg,
                 "roi_cls": roi_cls, "roi_reg": roi_reg}
        if with_masks:
            m = out["mask_logits"].shape[1]
            tgt_masks = roi_mask_targets(
                masks, best_gt, out["proposals"], size=(m, m)
            )
            parts["mask"] = mask_loss(out["mask_logits"], tgt_cls, tgt_masks, fg)
        if with_keypoints:
            hm = out["kp_logits"].shape[1]
            tgt_xy, tgt_vis = keypoint_targets(
                kps, kp_vis, best_gt, out["proposals"], heatmap_size=hm
            )
            parts["keypoint"] = keypoint_loss(out["kp_logits"], tgt_xy, tgt_vis, fg)
        return sum(parts.values()), parts

    @jax.jit
    def step(params, opt_state, *arrays):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, *arrays
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, parts

    history = {"loss": [], "map50": None}
    if loss_breakdown:
        history["parts"] = []
    for i in range(num_steps):
        item = items[i % len(items)]
        params, opt_state, loss, parts = step(params, opt_state, *item_arrays(item))
        history["loss"].append(float(loss))
        if loss_breakdown:
            history["parts"].append({k: float(v) for k, v in parts.items()})

    # mAP@0.5 (+ ROI-frame mask IoU when the mask branch trains) — over
    # `eval_items` when given (held-out protocol), else the training set
    # (the reference's in-domain shapes protocol).
    from ..train.eval_detection import compute_keypoint_ap, mask_mean_iou

    infer = jax.jit(lambda p, im: model.apply(p, im, train=False))
    aps, mious, kp_aps = [], [], []
    for item in eval_items if eval_items is not None else items:
        out = infer(params, jnp.asarray(item["image"], jnp.float32))
        valid = np.asarray(out["valid"])
        pb = np.asarray(out["boxes"])[valid]
        pc = np.asarray(out["classes"])[valid]
        ps = np.asarray(out["scores"])[valid]
        ap, _, _ = compute_ap(pb, pc, ps, item["boxes"], item["classes"])
        aps.append(ap)
        if with_masks:
            mious.append(
                mask_mean_iou(
                    np.asarray(out["masks"])[valid], pb, pc, ps,
                    item["masks"], item["boxes"], item["classes"],
                )
            )
        if with_keypoints and "keypoints" in out and len(item["boxes"]):
            gb = np.asarray(item["boxes"], np.float64)
            areas = np.maximum(gb[:, 2] - gb[:, 0], 1.0) * np.maximum(
                gb[:, 3] - gb[:, 1], 1.0
            )
            kp_aps.append(
                compute_keypoint_ap(
                    np.asarray(out["keypoints"])[valid], ps,
                    np.asarray(item["keypoints"]), areas,
                )["kp_ap50"]
            )
    history["map50"] = float(np.mean(aps))
    if with_masks:
        history["mask_iou"] = float(np.mean(mious))
    if kp_aps:
        history["kp_ap50"] = float(np.mean(kp_aps))
    return params, history


def train_detection_shapes(
    num_steps: int = 50,
    num_items: int = 8,
    h: int = 64,
    lr: float = 1e-3,
    holdout: int = 0,
    seed: int = 0,
    model_kwargs: dict | None = None,
    **kwargs,
):
    """Train the detection family on the procedural shapes dataset and
    evaluate mAP@0.5 + mask IoU (the reference's shapes-train protocol,
    `Mask_RCNN/samples/shapes/shapes.py` train/eval loop at library scale).

    `holdout > 0` evaluates on that many NEVER-TRAINED items drawn from a
    disjoint seed (the val_dataset split of `shapes.py`'s train cell)
    instead of the training set. Extra kwargs (with_masks/with_keypoints/
    loss_breakdown) pass through to `train_detection_items`.

    Returns (params, history) with history['loss'], 'map50' (+'mask_iou').
    """
    from ..data.shapes import NUM_CLASSES, ShapesDetection

    ds = ShapesDetection(num_items=num_items, h=h, w=h, max_shapes=2, seed=seed)
    items = [ds.padded(i) for i in range(num_items)]
    eval_items = None
    if holdout:
        val = ShapesDetection(
            num_items=holdout, h=h, w=h, max_shapes=2, seed=seed + 1000
        )
        eval_items = [val.padded(i) for i in range(holdout)]
    return train_detection_items(
        items, NUM_CLASSES, num_steps=num_steps, lr=lr, seed=seed,
        model_kwargs=model_kwargs, eval_items=eval_items, **kwargs,
    )


def train_detection_coco(
    root: str,
    ann_file: str,
    num_steps: int = 100,
    size: int = 128,
    max_gt: int = 16,
    lr: float = 1e-3,
    max_items: int | None = None,
    seed: int = 0,
    model_kwargs: dict | None = None,
    holdout: int = 0,
):
    """Train the detection family on a COCO-format dataset
    (`samples/coco/coco.py` train protocol + `lib/datasets/json_dataset.py`
    loading, without pycocotools): images resized to a static (size, size),
    GT padded to max_gt, single jitted step reused across the epoch.

    `holdout > 0` reserves the LAST N dataset items for evaluation only —
    history['map50'] then reports held-out mAP (the reference's train/val
    protocol, `samples/coco/coco.py:342-398`); with holdout=0 it is
    in-domain training-set mAP and must be read as such.

    Returns (params, history) with history['loss'] and history['map50'].
    """
    from ..data.coco import COCODetection

    ds = COCODetection(root, ann_file, max_items=max_items)
    items = [ds.padded(i, size=size, max_gt=max_gt) for i in range(len(ds))]
    eval_items = None
    if holdout:
        if holdout >= len(items):
            raise ValueError(
                f"holdout={holdout} needs at least {holdout + 1} items, "
                f"dataset has {len(items)}"
            )
        items, eval_items = items[:-holdout], items[-holdout:]
    kwargs = dict(num_proposals=64, num_detections=16)
    kwargs.update(model_kwargs or {})
    return train_detection_items(
        items, ds.num_classes, num_steps=num_steps, lr=lr, seed=seed,
        model_kwargs=kwargs, eval_items=eval_items,
    )


def _stack_detection_batch(items):
    """Stack padded shapes-dataset items into batch-leading arrays."""
    return (
        jnp.asarray(np.stack([it["image"] for it in items]), jnp.float32),
        jnp.asarray(np.stack([it["boxes_padded"] for it in items])),
        jnp.asarray(np.stack([it["classes_padded"] for it in items])),
        jnp.asarray(np.stack([it["gt_valid"] for it in items])),
        jnp.asarray(
            np.stack([it["masks_padded"] for it in items]), jnp.float32
        ),
    )


def train_detection_shapes_batched(
    num_steps: int = 20,
    batch_size: int = 8,
    num_items: int = 16,
    h: int = 64,
    lr: float = 1e-3,
    seed: int = 0,
    mesh=None,
    eval_at_end: bool = False,
    model_kwargs: dict | None = None,
):
    """Multi-image data-parallel detection training on procedural shapes.

    Capability counterpart of the reference's multi-GPU trainers — torch
    `mynn.DataParallel` scatter/replicate/gather
    (`mask-rcnn.pytorch/lib/nn/parallel/data_parallel.py:74-141`, wired at
    `tools/train_net_step.py:339-340`) and the Keras replica-tower
    `ParallelModel` (`Mask_RCNN/mrcnn/parallel_model.py:54-140`). TPU-first
    design: ONE jitted SPMD program — the per-image loss is vmapped over a
    padded fixed-shape batch, the batch is sharded over the mesh 'data'
    axis and params stay replicated, so XLA inserts the gradient
    all-reduce itself (no scatter/gather/replica plumbing to maintain).

    Returns (params, history): history['loss'] per-step batch-mean losses,
    plus 'map50'/'map' when `eval_at_end`.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    from ..data.shapes import NUM_CLASSES, ShapesDetection
    from ..models.detection.losses import (
        mask_loss, roi_losses, roi_mask_targets, rpn_losses,
    )
    from ..models.detection.rcnn import MaskRCNN

    ds = ShapesDetection(num_items=num_items, h=h, w=h, max_shapes=2, seed=seed)
    items = [ds.padded(i) for i in range(num_items)]
    kwargs = dict(
        num_classes=NUM_CLASSES, blocks=(1, 1, 1, 1), fpn_dim=32,
        num_proposals=32, num_detections=8, score_thresh=-1.0,
    )
    kwargs.update(model_kwargs or {})
    model = MaskRCNN(**kwargs)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.asarray(items[0]["image"], jnp.float32),
        train=True,
    )
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_one(params, image, boxes, cls, valid, masks):
        out = model.apply(
            params, image, train=True, gt_boxes=boxes, gt_valid=valid
        )
        rpn_cls, rpn_reg = rpn_losses(
            out["rpn_logits"], out["rpn_deltas"], out["anchors"], boxes, valid
        )
        roi_cls, roi_reg, tgt_cls, best_gt, fg = roi_losses(
            out["cls_scores"], out["cls_deltas"], out["proposals"],
            out["proposal_valid"], boxes, cls, valid,
        )
        m = out["mask_logits"].shape[1]
        tgt_masks = roi_mask_targets(masks, best_gt, out["proposals"], size=(m, m))
        ml = mask_loss(out["mask_logits"], tgt_cls, tgt_masks, fg)
        return rpn_cls + rpn_reg + roi_cls + roi_reg + ml

    def loss_fn(params, images, boxes, cls, valid, masks):
        return jax.vmap(loss_one, in_axes=(None, 0, 0, 0, 0, 0))(
            params, images, boxes, cls, valid, masks
        ).mean()

    @jax.jit
    def step(params, opt_state, images, boxes, cls, valid, masks):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, images, boxes, cls, valid, masks
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    batch_shard = None
    if mesh is not None:
        batch_shard = NamedSharding(mesh, PartitionSpec("data"))
        rep = NamedSharding(mesh, PartitionSpec())
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)

    history = {"loss": []}
    for i in range(num_steps):
        batch = [items[(i * batch_size + j) % num_items] for j in range(batch_size)]
        arrays = _stack_detection_batch(batch)
        if batch_shard is not None:
            arrays = tuple(jax.device_put(a, batch_shard) for a in arrays)
        params, opt_state, loss = step(params, opt_state, *arrays)
        history["loss"].append(float(loss))

    if eval_at_end:
        history.update(evaluate_detection(model, params, items, mesh=mesh))
    return params, history


def evaluate_detection(model, params, items, mesh=None, batch_size: int | None = None):
    """Batched dataset mAP evaluation in one SPMD program.

    Counterpart of the reference's multi-process eval sharding — the
    parent/child dataset-range protocol of `lib/core/test_engine.py:168-214`
    + `lib/utils/subprocess.py:29-100` and the per-image loops of
    `Mask_RCNN/mrcnn/utils.py:665-811`. Here inference is vmapped over a
    batch sharded on the mesh 'data' axis (padding the tail by repetition),
    matching is done host-side per image, and AP is averaged — no
    subprocess/pickle plumbing.

    Returns {'map50': AP@0.5, 'map': mAP@[.5:.95]} averaged over items
    (Mask-RCNN utils semantics), plus the dataset-level COCO-definition
    metrics 'coco_map50'/'coco_map' (per-category, 101-point — what
    pycocotools computes; `eval_detection.coco_map`) and, when the model
    emits decoded keypoints and the items carry GT keypoints, OKS
    keypoint AP 'kp_ap'/'kp_ap50'
    (`mask-rcnn.pytorch/BENCHMARK.md:231-` metric).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    from ..train.eval_detection import (coco_map, compute_ap,
                                        compute_keypoint_ap,
                                        compute_map_range)

    n = len(items)
    shard = mesh.shape["data"] if mesh is not None else 1
    if batch_size is None:
        # Cap the default — one vmapped program over the whole dataset
        # would blow memory/compile time on anything non-toy. 8 images per
        # shard, rounded to a shard multiple, tail padded by repetition.
        batch_size = min(max(n, 1), 8 * shard)
        batch_size += (-batch_size) % shard

    infer = jax.jit(
        jax.vmap(lambda p, im: model.apply(p, im, train=False), in_axes=(None, 0))
    )
    batch_shard = (
        NamedSharding(mesh, PartitionSpec("data")) if mesh is not None else None
    )

    outs = []
    for lo in range(0, n, batch_size):
        batch = [items[min(lo + j, n - 1)] for j in range(batch_size)]
        images = jnp.asarray(
            np.stack([it["image"] for it in batch]), jnp.float32
        )
        if batch_shard is not None:
            images = jax.device_put(images, batch_shard)
        out = jax.device_get(infer(params, images))
        keep = min(batch_size, n - lo)
        outs.extend(
            {k: np.asarray(v[j]) for k, v in out.items()} for j in range(keep)
        )

    ap50s, aps, kp_aps, kp_ap50s = [], [], [], []
    cpreds, cgts = [], []
    for item, out in zip(items, outs):
        valid = out["valid"].astype(bool)
        pb, pc, ps = out["boxes"][valid], out["classes"][valid], out["scores"][valid]
        ap, _, _ = compute_ap(pb, pc, ps, item["boxes"], item["classes"])
        ap50s.append(ap)
        aps.append(compute_map_range(pb, pc, ps, item["boxes"], item["classes"]))
        cpreds.append({"boxes": pb, "classes": pc, "scores": ps})
        cgts.append({"boxes": np.asarray(item["boxes"]),
                     "classes": np.asarray(item["classes"])})
        if "keypoints" in out and "keypoints" in item and len(item["boxes"]):
            gb = np.asarray(item["boxes"], np.float64)
            areas = np.maximum(gb[:, 2] - gb[:, 0], 1.0) * np.maximum(
                gb[:, 3] - gb[:, 1], 1.0
            )
            r = compute_keypoint_ap(
                out["keypoints"][valid], ps, np.asarray(item["keypoints"]),
                areas,
            )
            kp_aps.append(r["kp_ap"])
            kp_ap50s.append(r["kp_ap50"])
    res = {"map50": float(np.mean(ap50s)), "map": float(np.mean(aps))}
    cm = coco_map(cpreds, cgts)
    res["coco_map"] = cm["map"]
    res["coco_map50"] = cm["map50"]
    if kp_aps:
        res["kp_ap"] = float(np.mean(kp_aps))
        res["kp_ap50"] = float(np.mean(kp_ap50s))
    return res


def train_uncertainty(
    items: list,
    num_steps: int = 60,
    lr: float = 1e-3,
    niters: int = 2,
    r: int = 15,
    num_disp: int = 16,
    d_feat: int = 64,
    seed: int = 0,
    unc_weighted: bool = False,
):
    """Train the uncertainty-regressing CRF refiner end-to-end
    (`L1UncRegressor`, `crf/mb_stereo_crf.py:37-60`): the 3-conv
    uncertainty head produces per-pixel confidence exp(−s) that gates the
    CRF message pass (`CRFwUncertainty`, `:81-102`), trained jointly with
    the guide projection and compatibility by Adam on masked L1.

    `unc_weighted=True` uses the reference's (commented) heteroscedastic
    form |conf·(d − y)| − log conf instead of plain L1.

    Args:
      items: dicts with 'left', 'right' (h, w, 3) and 'disparity' (h, w)
        GT (0 = invalid).

    Returns (params, history with per-step loss + before/after masked L1).
    """
    from ..models.features import random_features as _rf
    from ..models.refiner import uncertainty_apply, uncertainty_init
    from ..train.metrics import masked_l1

    params = uncertainty_init(jax.random.PRNGKey(seed), d_in=d_feat)

    def prep(item):
        left = jnp.asarray(item["left"], jnp.float32)
        right = jnp.asarray(item["right"], jnp.float32)
        gt = jnp.asarray(item["disparity"], jnp.float32)
        logits = -cost_volume(left, right, num_disp, 9)
        feats = _rf(left, out_dim=d_feat)
        return logits, left, feats, gt

    batches = [prep(it) for it in items]

    def loss_fn(p, logits, img, feats, gt):
        depth, conf = uncertainty_apply(p, logits, img, feats, niters, r)
        if unc_weighted:
            mask = (gt > 0).astype(depth.dtype)
            resid = jnp.abs(conf * (depth - gt)) - jnp.log(conf + 1e-8)
            return (resid * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return masked_l1(depth, gt)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, *b):
        loss, grads = jax.value_and_grad(loss_fn)(p, *b)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    def eval_l1(p):
        return float(
            np.mean([
                float(masked_l1(uncertainty_apply(p, *b[:3], niters, r)[0], b[3]))
                for b in batches
            ])
        )

    history = {"loss": [], "l1_before": eval_l1(params)}
    for i in range(num_steps):
        params, opt_state, loss = step(params, opt_state, *batches[i % len(batches)])
        history["loss"].append(float(loss))
    history["l1_after"] = eval_l1(params)
    return params, history


def train_upsampler(
    items: list,
    num_steps: int = 100,
    lr: float = 3e-3,
    niters: int = 1,
    r: int = 5,
    seed: int = 0,
):
    """Depth-upsampling training (`crf/mb_stereo_crf.py:165-181` protocol:
    Adam(3e-3, betas=(.9,.9)), masked L1 on gt>0).

    Args:
      items: list of dicts with 'disp_lowres' (hl, wl), 'image' (h, w, 3),
        'disparity' (h, w) — the `MiddleburyStereo2005` item contract (or
        synthetic equivalents).

    Returns (params, history with per-step loss + before/after masked L1).
    """
    from ..models.refiner import upsampler_apply, upsampler_init
    from ..train.metrics import masked_l1

    params = upsampler_init()
    opt = optax.adam(lr, b1=0.9, b2=0.9)
    opt_state = opt.init(params)

    def loss_fn(p, low, img, gt):
        out = upsampler_apply(p, low, img, niters=niters, r=r)
        return masked_l1(out, gt)

    @jax.jit
    def step(p, o, low, img, gt):
        loss, grads = jax.value_and_grad(loss_fn)(p, low, img, gt)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    def as_batch(item):
        return (
            jnp.asarray(item["disp_lowres"], jnp.float32),
            jnp.asarray(item["image"], jnp.float32),
            jnp.asarray(item["disparity"], jnp.float32),
        )

    batches = [as_batch(it) for it in items]
    before = float(np.mean([float(loss_fn(params, *b)) for b in batches]))
    history = {"loss": []}
    for i in range(num_steps):
        low, img, gt = batches[i % len(batches)]
        params, opt_state, loss = step(params, opt_state, low, img, gt)
        history["loss"].append(float(loss))
    history["l1_before"] = before
    history["l1_after"] = float(np.mean([float(loss_fn(params, *b)) for b in batches]))
    return params, history

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
):
    """Adam training of the CRF hyperparameters on one stereo pair
    (masked MSE on gt>0 pixels, `trainableDenseCRF.ipynb` cell 14).

    Returns (params, history) with history['loss'] per step and
    before/after masked MSE of the decoded disparity.
    """
    key = jax.random.PRNGKey(seed)
    left_j = jnp.asarray(left, jnp.float32)
    gt_j = jnp.asarray(gt, jnp.float32)
    mask = (gt_j > 0).astype(jnp.float32)

    E0 = cost_volume(left_j, jnp.asarray(right, jnp.float32), num_disp, 9)
    logits = -E0
    feats = random_features(left_j, out_dim=d_feat)

    params = trainable_crf_init(key, d_feat=d_feat)

    def loss_fn(p):
        refined = trainable_crf_forward(p, logits, left_j, feats, niters)
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
):
    """Core single-device detection train loop over fixed-shape items.

    Each item carries `image` (h, w, 3) plus padded GT
    (`boxes_padded`/`classes_padded`/`gt_valid`) and unpadded
    `boxes`/`classes` for the mAP@0.5 eval at the end. One XLA program
    serves every item (static shapes). Returns (params, history).
    """
    import optax

    from ..models.detection.losses import roi_losses, rpn_losses
    from ..models.detection.rcnn import MaskRCNN
    from ..train.eval_detection import compute_ap

    kwargs = dict(
        num_classes=num_classes, blocks=(1, 1, 1, 1), fpn_dim=32,
        num_proposals=32, num_detections=8, score_thresh=-1.0,
    )
    kwargs.update(model_kwargs or {})
    model = MaskRCNN(**kwargs)
    key = jax.random.PRNGKey(seed)
    img0 = jnp.asarray(items[0]["image"], jnp.float32)
    params = model.init(key, img0, train=True)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(params, image, boxes, cls, valid):
        out = model.apply(params, image, train=True)
        rpn_cls, rpn_reg = rpn_losses(
            out["rpn_logits"], out["rpn_deltas"], out["anchors"], boxes, valid
        )
        roi_cls, roi_reg, *_ = roi_losses(
            out["cls_scores"], out["cls_deltas"], out["proposals"],
            out["proposal_valid"], boxes, cls, valid,
        )
        return rpn_cls + rpn_reg + roi_cls + roi_reg

    @jax.jit
    def step(params, opt_state, image, boxes, cls, valid):
        loss, grads = jax.value_and_grad(loss_fn)(params, image, boxes, cls, valid)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = {"loss": [], "map50": None}
    for i in range(num_steps):
        item = items[i % len(items)]
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(item["image"], jnp.float32),
            jnp.asarray(item["boxes_padded"]),
            jnp.asarray(item["classes_padded"]),
            jnp.asarray(item["gt_valid"]),
        )
        history["loss"].append(float(loss))

    # mAP@0.5 over the training set (shapes protocol evaluates in-domain)
    infer = jax.jit(lambda p, im: model.apply(p, im, train=False))
    aps = []
    for item in items:
        out = infer(params, jnp.asarray(item["image"], jnp.float32))
        valid = np.asarray(out["valid"])
        ap, _, _ = compute_ap(
            np.asarray(out["boxes"])[valid],
            np.asarray(out["classes"])[valid],
            np.asarray(out["scores"])[valid],
            item["boxes"],
            item["classes"],
        )
        aps.append(ap)
    history["map50"] = float(np.mean(aps))
    return params, history


def train_detection_shapes(
    num_steps: int = 50,
    num_items: int = 8,
    h: int = 64,
    lr: float = 1e-3,
    eval_every: int | None = None,
    seed: int = 0,
    model_kwargs: dict | None = None,
):
    """Train the detection family on the procedural shapes dataset and
    evaluate mAP@0.5 (the reference's shapes-train protocol,
    `Mask_RCNN/samples/shapes/shapes.py` train/eval loop at library scale).

    Returns (params, history) with history['loss'] and history['map50'].
    """
    from ..data.shapes import NUM_CLASSES, ShapesDetection

    ds = ShapesDetection(num_items=num_items, h=h, w=h, max_shapes=2, seed=seed)
    items = [ds.padded(i) for i in range(num_items)]
    return train_detection_items(
        items, NUM_CLASSES, num_steps=num_steps, lr=lr, seed=seed,
        model_kwargs=model_kwargs,
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
):
    """Train the detection family on a COCO-format dataset
    (`samples/coco/coco.py` train protocol + `lib/datasets/json_dataset.py`
    loading, without pycocotools): images resized to a static (size, size),
    GT padded to max_gt, single jitted step reused across the epoch.

    Returns (params, history) with history['loss'] and history['map50'].
    """
    from ..data.coco import COCODetection

    ds = COCODetection(root, ann_file, max_items=max_items)
    items = [ds.padded(i, size=size, max_gt=max_gt) for i in range(len(ds))]
    kwargs = dict(num_proposals=64, num_detections=16)
    kwargs.update(model_kwargs or {})
    return train_detection_items(
        items, ds.num_classes, num_steps=num_steps, lr=lr, seed=seed,
        model_kwargs=kwargs,
    )


def _stack_detection_batch(items):
    """Stack padded shapes-dataset items into batch-leading arrays."""
    return (
        jnp.asarray(np.stack([it["image"] for it in items]), jnp.float32),
        jnp.asarray(np.stack([it["boxes_padded"] for it in items])),
        jnp.asarray(np.stack([it["classes_padded"] for it in items])),
        jnp.asarray(np.stack([it["gt_valid"] for it in items])),
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
    from ..models.detection.losses import roi_losses, rpn_losses
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

    def loss_one(params, image, boxes, cls, valid):
        out = model.apply(params, image, train=True)
        rpn_cls, rpn_reg = rpn_losses(
            out["rpn_logits"], out["rpn_deltas"], out["anchors"], boxes, valid
        )
        roi_cls, roi_reg, *_ = roi_losses(
            out["cls_scores"], out["cls_deltas"], out["proposals"],
            out["proposal_valid"], boxes, cls, valid,
        )
        return rpn_cls + rpn_reg + roi_cls + roi_reg

    def loss_fn(params, images, boxes, cls, valid):
        return jax.vmap(loss_one, in_axes=(None, 0, 0, 0, 0))(
            params, images, boxes, cls, valid
        ).mean()

    @jax.jit
    def step(params, opt_state, images, boxes, cls, valid):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, boxes, cls, valid)
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

    Returns {'map50': AP@0.5, 'map': mAP@[.5:.95]} averaged over items.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    from ..train.eval_detection import compute_ap, compute_map_range

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

    ap50s, aps = [], []
    for item, out in zip(items, outs):
        valid = out["valid"].astype(bool)
        pb, pc, ps = out["boxes"][valid], out["classes"][valid], out["scores"][valid]
        ap, _, _ = compute_ap(pb, pc, ps, item["boxes"], item["classes"])
        ap50s.append(ap)
        aps.append(compute_map_range(pb, pc, ps, item["boxes"], item["classes"]))
    return {"map50": float(np.mean(ap50s)), "map": float(np.mean(aps))}


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

"""Detection training losses + target assignment, fixed-shape.

The five-loss family of the reference (`mrcnn/model.py:1015-1192` and
`lib/modeling/{rpn_heads,fast_rcnn,mask_rcnn}_heads.py` losses):
RPN objectness (BCE on sampled anchors), RPN box (smooth-L1 on positives),
ROI classification (softmax CE), ROI box regression (smooth-L1, per-class),
mask (per-pixel BCE on the target class slice).

Target assignment is IoU-based matching with fixed-size outputs: each
anchor/proposal gets a label in {-1 ignore, 0 negative, 1.. positive-class}
and regression targets vs its best-matching GT box — no dynamic sampling
loops (the reference's random minibatch sampling becomes weighted masking).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.detection import encode_boxes, iou_matrix, roi_align

__all__ = [
    "smooth_l1",
    "match_anchors",
    "rpn_losses",
    "roi_losses",
    "mask_loss",
    "roi_mask_targets",
    "keypoint_targets",
]


def smooth_l1(x, beta: float = 1.0 / 9.0):
    """Huber/smooth-L1 (`lib/utils/net_utils.py` semantics)."""
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x**2 / beta, ax - 0.5 * beta)


def match_anchors(
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    pos_iou: float = 0.7,
    neg_iou: float = 0.3,
):
    """IoU matching: returns (labels, matched_gt_idx).

    labels: (A,) int32 — 1 positive, 0 negative, -1 ignore.
    Anchors with IoU ≥ pos_iou are positive, < neg_iou negative, else
    ignored; additionally the best anchor per GT is positive
    (`mrcnn/model.py` build_rpn_targets semantics).
    """
    iou = iou_matrix(anchors, gt_boxes)  # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    labels = jnp.where(best_iou >= pos_iou, 1, jnp.where(best_iou < neg_iou, 0, -1))
    # force-match the argmax anchor of each valid GT
    best_anchor = jnp.argmax(iou, axis=0)  # (G,)
    labels = labels.at[best_anchor].set(jnp.where(gt_valid, 1, labels[best_anchor]))
    return labels.astype(jnp.int32), best_gt.astype(jnp.int32)


def rpn_losses(
    rpn_logits: jax.Array,
    rpn_deltas: jax.Array,
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
):
    """(objectness BCE, box smooth-L1) averaged over contributing anchors."""
    labels, matched = match_anchors(anchors, gt_boxes, gt_valid)
    pos = labels == 1
    neg = labels == 0
    tgt = (labels == 1).astype(rpn_logits.dtype)
    bce = (
        jnp.maximum(rpn_logits, 0)
        - rpn_logits * tgt
        + jnp.log1p(jnp.exp(-jnp.abs(rpn_logits)))
    )
    # CLASS-BALANCED objectness: the reference SAMPLES 256 anchors at up
    # to 1:1 pos:neg (`mrcnn/model.py` build_rpn_targets RPN_TRAIN_ANCHORS
    # _PER_IMAGE, Detectron RPN_BATCH_SIZE/FG_FRACTION); with a plain
    # mean over every anchor the ~few positives carry ~1/3000 of the
    # gradient and objectness never fires (round-4: trained RPN logits
    # topped out at -0.4 on anchors sitting ON the object — detections
    # were all background). Per-group means weighted 1:1 are the
    # static-shape XLA equivalent of the reference's balanced sampling.
    cls_loss = 0.5 * (bce * pos).sum() / jnp.maximum(pos.sum(), 1) + 0.5 * (
        bce * neg
    ).sum() / jnp.maximum(neg.sum(), 1)

    reg_tgt = encode_boxes(anchors, gt_boxes[matched])
    reg = smooth_l1(rpn_deltas - reg_tgt).sum(-1)
    reg_loss = (reg * pos).sum() / jnp.maximum(pos.sum(), 1)
    return cls_loss, reg_loss


def roi_losses(
    cls_scores: jax.Array,  # (R, K)
    cls_deltas: jax.Array,  # (R, K, 4)
    proposals: jax.Array,  # (R, 4)
    prop_valid: jax.Array,  # (R,)
    gt_boxes: jax.Array,  # (G, 4)
    gt_classes: jax.Array,  # (G,) int, 1..K-1
    gt_valid: jax.Array,  # (G,)
    fg_iou: float = 0.5,
):
    """(classification CE, per-class box smooth-L1)."""
    iou = iou_matrix(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    fg = (best_iou >= fg_iou) & prop_valid
    tgt_cls = jnp.where(fg, gt_classes[best_gt], 0)

    logp = jax.nn.log_softmax(cls_scores, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt_cls[:, None], axis=1)[:, 0]
    # fg/bg-balanced CE at the reference's FG_FRACTION=0.25 mix
    # (Detectron ROI BATCH_SIZE sampling; same rationale as rpn_losses)
    bg = prop_valid & ~fg
    cls_loss = 0.25 * (ce * fg).sum() / jnp.maximum(fg.sum(), 1) + 0.75 * (
        ce * bg
    ).sum() / jnp.maximum(bg.sum(), 1)

    reg_tgt = encode_boxes(proposals, gt_boxes[best_gt])
    deltas_at_cls = jnp.take_along_axis(
        cls_deltas, tgt_cls[:, None, None].repeat(4, -1), axis=1
    )[:, 0]
    reg = smooth_l1(deltas_at_cls - reg_tgt).sum(-1)
    reg_loss = (reg * fg).sum() / jnp.maximum(fg.sum(), 1)
    return cls_loss, reg_loss, tgt_cls, best_gt, fg


def roi_mask_targets(
    gt_masks: jax.Array,  # (G, h, w) {0,1} full-image instance masks
    best_gt: jax.Array,  # (R,) matched GT index per proposal
    proposals: jax.Array,  # (R, 4)
    size: tuple[int, int] = (28, 28),
) -> jax.Array:
    """ROI-frame GT mask targets: crop+resize each proposal's matched GT
    instance mask to the mask-head resolution.

    `DetectionTargetLayer` semantics (`Mask_RCNN/mrcnn/model.py:623-686`
    crops GT masks with `tf.image.crop_and_resize` per sampled ROI;
    `mask-rcnn.pytorch/lib/roi_data/mask_rcnn.py` rasterizes polygons into
    the ROI frame). XLA-first: stack the G instance masks as CHANNELS of
    one (h, w, G) image, ROI-Align every proposal against all of them in a
    single fixed-shape call, then select the matched channel — no per-ROI
    dynamic crops. G is the (small) static GT pad size, so the widened
    intermediate is cheap.

    Returns (R, m, m) float {0,1} targets (bilinear crop binarized at 0.5,
    matching the reference's `tf.round` after crop_and_resize).
    """
    stacked = jnp.moveaxis(gt_masks.astype(jnp.float32), 0, -1)  # (h, w, G)
    crops = roi_align(stacked, proposals, size, spatial_scale=1.0)  # (R,m,m,G)
    picked = jnp.take_along_axis(
        crops, best_gt[:, None, None, None], axis=-1
    )[..., 0]
    return (picked >= 0.5).astype(jnp.float32)


def keypoint_targets(
    gt_keypoints: jax.Array,  # (G, K, 2) xy image coords
    gt_kp_visible: jax.Array,  # (G, K) bool
    best_gt: jax.Array,  # (R,)
    proposals: jax.Array,  # (R, 4)
    heatmap_size: int = 56,
):
    """Map each matched GT keypoint into its proposal's heatmap bin frame
    (`lib/roi_data/keypoint_rcnn.py` target semantics): bin coords in
    [0, m), visibility ANDed with in-ROI containment.

    Returns (tgt_xy (R, K, 2) float bin coords, visible (R, K) bool) —
    the `keypoint_loss` contract (rcnn.py).
    """
    m = heatmap_size
    kps = gt_keypoints[best_gt]  # (R, K, 2)
    vis = gt_kp_visible[best_gt]  # (R, K)
    x1, y1 = proposals[:, 0], proposals[:, 1]
    bw = jnp.maximum(proposals[:, 2] - x1, 1.0)
    bh = jnp.maximum(proposals[:, 3] - y1, 1.0)
    bx = (kps[..., 0] - x1[:, None]) / bw[:, None] * m
    by = (kps[..., 1] - y1[:, None]) / bh[:, None] * m
    inb = (bx >= 0) & (bx < m) & (by >= 0) & (by < m)
    tgt_xy = jnp.stack([jnp.floor(bx), jnp.floor(by)], axis=-1)
    return tgt_xy, vis & inb


def mask_loss(
    mask_logits: jax.Array,  # (R, m, m, K)
    tgt_cls: jax.Array,  # (R,) int
    tgt_masks: jax.Array,  # (R, m, m) {0,1} ROI-cropped GT masks
    fg: jax.Array,  # (R,)
):
    """Per-pixel BCE on the predicted class slice (`mrcnn/model.py:1162-1192`)."""
    logits = jnp.take_along_axis(
        mask_logits, tgt_cls[:, None, None, None], axis=-1
    )[..., 0]
    t = tgt_masks.astype(logits.dtype)
    bce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_roi = bce.mean(axis=(1, 2))
    return (per_roi * fg).sum() / jnp.maximum(fg.sum(), 1)

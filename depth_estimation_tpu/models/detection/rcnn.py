"""Two-stage detector: RPN → proposals → ROI heads (box, mask).

The `Generalized_RCNN` / `MaskRCNN.build` capability
(`mask-rcnn.pytorch/lib/modeling/model_builder.py:71-250`,
`Mask_RCNN/mrcnn/model.py:1847-2101`) re-designed for XLA: every stage is
fixed-shape (top-K proposals, static detection count), NMS and ROI-Align
are the `ops.detection` primitives, and the whole inference path is one
jittable function. GroupNorm everywhere; channels-last.

This is the minimal complete two-stage pipeline: objectness + box deltas
per FPN level → decoded, clipped, NMS'd proposals → ROI-aligned features →
class scores + per-class boxes (+ mask head). Losses for training are in
`losses.py`.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.detection import (clip_boxes, decode_boxes, nms, roi_align,
                              roi_align_pyramid)
from .anchors import pyramid_anchors
from .backbone import ResNetFPN

__all__ = [
    "RPNHead",
    "BoxHead",
    "MaskHead",
    "MaskRCNN",
    "fpn_level_for_boxes",
    "perclass_detections",
]

FPN_STRIDES = (4, 8, 16, 32, 64)
FPN_SCALES = (32, 64, 128, 256, 512)


class RPNHead(nn.Module):
    """Shared conv → (objectness, deltas) per level
    (`rpn_graph`, `mrcnn/model.py:833-902`)."""

    num_anchors: int = 3
    dim: int = 256

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(self.dim, (3, 3), padding="SAME", name="rpn_conv")
        cls = nn.Conv(self.num_anchors, (1, 1), name="rpn_cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="rpn_reg")
        logits, deltas = [], []
        for f in feats:
            y = nn.relu(conv(f))
            logits.append(cls(y).reshape(-1))
            deltas.append(reg(y).reshape(-1, 4))
        return jnp.concatenate(logits), jnp.concatenate(deltas)


class BoxHead(nn.Module):
    """2-fc box head (`fpn_classifier_graph`, `mrcnn/model.py:903-958`)."""

    num_classes: int = 81
    dim: int = 1024

    @nn.compact
    def __call__(self, roi_feats):  # (R, ph, pw, c)
        R = roi_feats.shape[0]
        y = roi_feats.reshape(R, -1)
        y = nn.relu(nn.Dense(self.dim)(y))
        y = nn.relu(nn.Dense(self.dim)(y))
        scores = nn.Dense(self.num_classes)(y)
        deltas = nn.Dense(self.num_classes * 4)(y).reshape(R, self.num_classes, 4)
        return scores, deltas


class MaskHead(nn.Module):
    """4-conv + deconv mask head (`build_fpn_mask_graph`,
    `mrcnn/model.py:959-1014`)."""

    num_classes: int = 81
    dim: int = 256

    @nn.compact
    def __call__(self, roi_feats):  # (R, ph, pw, c) → (R, 2ph, 2pw, K)
        y = roi_feats
        for _ in range(4):
            y = nn.relu(nn.GroupNorm(num_groups=32)(nn.Conv(self.dim, (3, 3), padding="SAME")(y)))
        y = nn.relu(nn.ConvTranspose(self.dim, (2, 2), strides=(2, 2))(y))
        return nn.Conv(self.num_classes, (1, 1))(y)


def fpn_level_for_boxes(boxes: jax.Array, k0: int = 4, k_min: int = 2, k_max: int = 5):
    """log2 level assignment (`PyramidROIAlign`, `mrcnn/model.py:344-455`):
    k = k0 + log2(sqrt(area)/224), clipped to [k_min, k_max]."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 1.0
    )
    k = jnp.floor(k0 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-9))
    return jnp.clip(k, k_min, k_max).astype(jnp.int32)


def pyramid_roi_align(feats, boxes, output_size=(7, 7)):
    """ROI-Align from the FPN level each box maps to. Fixed shape, 1× work:
    one flattened-pyramid bilinear gather per box at its assigned level
    (`ops.detection.roi_align_pyramid`) — no dynamic partitioning (vs the
    reference's per-level gather/re-scatter at
    `collect_and_distribute_fpn_rpn_proposals.py`) and none of the 4×
    compute of the earlier align-all-levels-then-select form (round-5)."""
    levels = fpn_level_for_boxes(boxes)  # values in [2, 5]
    return roi_align_pyramid(
        [f[0] for f in feats[:4]], boxes, levels - 2, FPN_STRIDES[:4],
        output_size,
    )


def perclass_detections(
    probs: jax.Array,  # (P, K) softmax class probabilities
    cls_deltas: jax.Array,  # (P, K, 4) per-class box deltas
    proposals: jax.Array,  # (P, 4)
    prop_valid: jax.Array,  # (P,)
    h: int,
    w: int,
    num_detections: int,
    nms_thresh: float = 0.5,
    score_thresh: float = 0.05,
):
    """Per-class DetectionLayer (`mrcnn/model.py:785-832`,
    `lib/core/test.py:161-176` per-class refine+NMS), fixed-shape: every
    (proposal, foreground class) pair is a candidate with its OWN
    class-specific refined box; top-M candidates by score feed a single
    class-aware NMS (boxes offset into per-class coordinate slabs so
    suppression never crosses classes). Two overlapping objects of
    different classes on the same proposal both survive — the capability
    the argmax-class simplification dropped.

    Returns (boxes (D, 4), classes (D,), scores (D,), valid (D,)).
    """
    P, K = probs.shape
    cand_scores = jnp.where(prop_valid[:, None], probs[:, 1:], 0.0).reshape(-1)
    cand_boxes = clip_boxes(
        decode_boxes(
            jnp.repeat(proposals, K - 1, axis=0),
            cls_deltas[:, 1:].reshape(-1, 4),
        ),
        h, w,
    )  # (P·(K−1), 4)
    cand_cls = jnp.tile(jnp.arange(1, K, dtype=jnp.int32), P)
    M = min(4 * num_detections, P * (K - 1))
    topc = jnp.argsort(-cand_scores)[:M]
    slab = cand_cls[topc].astype(cand_boxes.dtype)[:, None] * (
        float(max(h, w)) + 1.0
    )
    keep, valid = nms(
        cand_boxes[topc] + slab, cand_scores[topc],
        nms_thresh, num_detections, score_threshold=score_thresh,
    )
    safe = topc[jnp.maximum(keep, 0)]
    return (
        jnp.where(valid[:, None], cand_boxes[safe], 0.0),
        jnp.where(valid, cand_cls[safe], 0),
        jnp.where(valid, cand_scores[safe], 0.0),
        valid,
    )


class MaskRCNN(nn.Module):
    """End-to-end two-stage detector (inference graph).

    `num_keypoints > 0` adds the keypoint branch to the graph — the
    `cfg.MODEL.KEYPOINTS_ON` wiring of the reference
    (`mask-rcnn.pytorch/lib/modeling/model_builder.py:110-124, 216-230`):
    a `KeypointHead` over the same (14, 14) ROI features, heatmap logits
    on proposals when training (targets are per-proposal) and decoded
    argmax keypoint coordinates on final detections at inference.
    """

    num_classes: int = 81
    blocks: Sequence[int] = (3, 4, 6, 3)
    fpn_dim: int = 256
    num_proposals: int = 256
    num_detections: int = 64
    rpn_nms_thresh: float = 0.7
    det_nms_thresh: float = 0.5
    score_thresh: float = 0.05
    num_keypoints: int = 0
    # backbone conventions — set from `utils.weights.resnet_import_kwargs`
    # (plus the checkpoint's width) when grafting pretrained weights
    backbone_norm: str = "gn"
    stride_1x1: bool = False
    base_width: int = 64

    @nn.compact
    def __call__(
        self, image, train: bool = False, gt_boxes=None, gt_valid=None
    ):  # (h, w, 3) → dict
        h, w = image.shape[:2]
        K = self.num_classes
        feats = ResNetFPN(
            self.blocks, self.fpn_dim, norm=self.backbone_norm,
            stride_1x1=self.stride_1x1, base_width=self.base_width,
        )(image[None])
        rpn_logits, rpn_deltas = RPNHead(dim=self.fpn_dim)(feats)

        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = pyramid_anchors(shapes, FPN_STRIDES, FPN_SCALES)

        # Proposal layer (`mrcnn/model.py:255-338`): decode, clip, NMS top-K.
        boxes = clip_boxes(decode_boxes(anchors, rpn_deltas), h, w)
        scores = jax.nn.sigmoid(rpn_logits)
        # pre-NMS top-N for tractable NMS matrix
        top = jnp.argsort(-scores)[: 4 * self.num_proposals]
        keep, valid = nms(
            boxes[top], scores[top], self.rpn_nms_thresh, self.num_proposals
        )
        prop_idx = top[jnp.maximum(keep, 0)]
        proposals = jnp.where(valid[:, None], boxes[prop_idx], 0.0)  # (P, 4)
        if train and gt_boxes is not None:
            # Append GT boxes to the training ROI set (Detectron's
            # `TRAIN.PROPOSAL_APPEND_GT`, `lib/datasets/json_dataset.py`
            # `_merge_proposal_boxes_into_roidb` +
            # `Mask_RCNN/mrcnn/model.py` USE_RPN_ROIS semantics): the ROI
            # heads see foreground samples from step 0 instead of waiting
            # for the RPN to converge. Static shape: GT replaces the
            # lowest-ranked proposal slots.
            G = gt_boxes.shape[0]
            proposals = jnp.concatenate([proposals[:-G], gt_boxes], axis=0)
            valid = jnp.concatenate([valid[:-G], gt_valid], axis=0)
        P = proposals.shape[0]

        # Box head on pooled proposals.
        roi_feats = pyramid_roi_align(feats, proposals, (7, 7))
        cls_scores, cls_deltas = BoxHead(K)(roi_feats)
        probs = jax.nn.softmax(cls_scores, axis=-1)

        final_boxes, final_cls, final_scores, valid2 = perclass_detections(
            probs, cls_deltas, proposals, valid, h, w,
            self.num_detections, self.det_nms_thresh, self.score_thresh,
        )

        # Mask head: on proposals when training (targets are per-proposal),
        # on final detections at inference.
        mask_boxes = proposals if train else final_boxes
        mask_feats = pyramid_roi_align(feats, mask_boxes, (14, 14))
        mask_logits = MaskHead(K)(mask_feats)  # (·, 28, 28, K)
        if train:
            masks = None
        else:
            masks = jax.nn.sigmoid(
                jnp.take_along_axis(
                    mask_logits, final_cls[:, None, None, None], axis=-1
                )[..., 0]
            )

        out = {
            "boxes": final_boxes,
            "classes": final_cls,
            "scores": final_scores,
            "valid": valid2,
            "masks": masks,  # (D, 28, 28) in ROI frame
            "proposals": proposals,
            "proposal_valid": valid,
            "rpn_scores": scores,
            # raw outputs for the training losses (losses.py)
            "rpn_logits": rpn_logits,
            "rpn_deltas": rpn_deltas,
            "anchors": anchors,
            "cls_scores": cls_scores,
            "cls_deltas": cls_deltas,
            "mask_logits": mask_logits,
        }

        if self.num_keypoints > 0:
            kp_logits = KeypointHead(self.num_keypoints, dim=self.fpn_dim)(
                mask_feats
            )  # (·, 56, 56, Kp) on the same ROI set as the mask head
            out["kp_logits"] = kp_logits
            if not train:
                # decode: argmax heatmap bin → image coordinates
                R, m, _, Kp = kp_logits.shape
                flat = kp_logits.reshape(R, m * m, Kp)
                bins = jnp.argmax(flat, axis=1)  # (R, Kp)
                bx = (bins % m).astype(jnp.float32) + 0.5
                by = (bins // m).astype(jnp.float32) + 0.5
                x1, y1 = mask_boxes[:, 0], mask_boxes[:, 1]
                bw = jnp.maximum(mask_boxes[:, 2] - x1, 1.0)
                bh = jnp.maximum(mask_boxes[:, 3] - y1, 1.0)
                out["keypoints"] = jnp.stack(
                    [
                        x1[:, None] + bx / m * bw[:, None],
                        y1[:, None] + by / m * bh[:, None],
                    ],
                    axis=-1,
                )  # (D, Kp, 2)
        return out


class KeypointHead(nn.Module):
    """Keypoint heatmap head (`lib/modeling/keypoint_rcnn_heads.py`
    capability): 8 convs + deconv + 2x upsample → per-keypoint logit maps."""

    num_keypoints: int = 17
    dim: int = 256

    @nn.compact
    def __call__(self, roi_feats):  # (R, ph, pw, c) → (R, 4ph, 4pw, K)
        y = roi_feats
        groups = max(1, min(32, self.dim // 8))
        for _ in range(4):
            y = nn.relu(nn.GroupNorm(num_groups=groups)(
                nn.Conv(self.dim, (3, 3), padding="SAME")(y)))
        y = nn.relu(nn.ConvTranspose(self.dim, (2, 2), strides=(2, 2))(y))
        y = nn.ConvTranspose(self.num_keypoints, (2, 2), strides=(2, 2))(y)
        return y


def keypoint_loss(kp_logits, tgt_xy, tgt_visible, fg):
    """Softmax cross-entropy over the flattened heatmap at the target
    keypoint bin (`keypoint_rcnn_heads.py` loss semantics).

    kp_logits: (R, m, m, K); tgt_xy: (R, K, 2) bin coords in [0, m);
    tgt_visible: (R, K) bool; fg: (R,) foreground mask.
    """
    R, m, _, K = kp_logits.shape
    flat = kp_logits.reshape(R, m * m, K)
    logp = jax.nn.log_softmax(flat, axis=1)
    bins = (tgt_xy[..., 1].astype(jnp.int32) * m + tgt_xy[..., 0].astype(jnp.int32))
    bins = jnp.clip(bins, 0, m * m - 1)
    picked = jnp.take_along_axis(logp, bins[:, None, :], axis=1)[:, 0, :]  # (R, K)
    w = tgt_visible.astype(picked.dtype) * fg[:, None].astype(picked.dtype)
    return -(picked * w).sum() / jnp.maximum(w.sum(), 1.0)

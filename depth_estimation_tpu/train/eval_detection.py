"""Detection evaluation: VOC/COCO-style average precision.

Capability of the reference's AP utilities (`Mask_RCNN/mrcnn/utils.py:
665-811` `compute_ap`/`compute_recall` and the pycocotools-based
`evaluate_coco`): greedy IoU matching of ranked predictions to GT,
precision/recall curve integration, mAP over IoU thresholds .5:.95.

Host-side numpy (evaluation is not a hot path).
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "compute_ap",
    "compute_map_range",
    "match_predictions",
    "mask_mean_iou",
]


def _iou_matrix_np(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def match_predictions(pred_boxes, pred_classes, pred_scores, gt_boxes, gt_classes,
                      iou_threshold=0.5):
    """Greedy score-ranked matching. Returns (pred_match, gt_match) index
    arrays (-1 = unmatched), semantics of `mrcnn/utils.py:665-723`."""
    order = np.argsort(-pred_scores)
    pred_boxes = pred_boxes[order]
    pred_classes = pred_classes[order]
    iou = _iou_matrix_np(pred_boxes, gt_boxes) if len(gt_boxes) else np.zeros((len(pred_boxes), 0))
    pred_match = -np.ones(len(pred_boxes), np.int64)
    gt_match = -np.ones(len(gt_boxes), np.int64)
    for i in range(len(pred_boxes)):
        cand = np.argsort(-iou[i]) if iou.shape[1] else []
        for j in cand:
            if iou[i, j] < iou_threshold:
                break
            if gt_match[j] >= 0 or gt_classes[j] != pred_classes[i]:
                continue
            gt_match[j] = i
            pred_match[i] = j
            break
    return pred_match, gt_match, order


def compute_ap(pred_boxes, pred_classes, pred_scores, gt_boxes, gt_classes,
               iou_threshold=0.5):
    """AP at one IoU threshold (interpolated PR integration,
    `mrcnn/utils.py:716-757`). Returns (AP, precisions, recalls)."""
    if len(gt_boxes) == 0:
        return (1.0 if len(pred_boxes) == 0 else 0.0), None, None
    if len(pred_boxes) == 0:
        return 0.0, None, None
    pred_match, _, _ = match_predictions(
        pred_boxes, pred_classes, pred_scores, gt_boxes, gt_classes, iou_threshold
    )
    tp = (pred_match >= 0).astype(np.float64)
    precisions = np.cumsum(tp) / (np.arange(len(tp)) + 1)
    recalls = np.cumsum(tp) / len(gt_boxes)
    precisions = np.concatenate([[0.0], precisions, [0.0]])
    recalls = np.concatenate([[0.0], recalls, [1.0]])
    for i in range(len(precisions) - 2, -1, -1):
        precisions[i] = max(precisions[i], precisions[i + 1])
    idx = np.where(recalls[1:] != recalls[:-1])[0] + 1
    ap = float(np.sum((recalls[idx] - recalls[idx - 1]) * precisions[idx]))
    return ap, precisions, recalls


def _crop_mask_np(mask, box, size):
    """Nearest-neighbor crop of a full-image {0,1} mask to `box`, resized
    to (size, size) — the host-side counterpart of
    `losses.roi_mask_targets` for evaluation."""
    h, w = mask.shape
    x1, y1, x2, y2 = box
    ys = y1 + (np.arange(size) + 0.5) / size * max(y2 - y1, 1.0)
    xs = x1 + (np.arange(size) + 0.5) / size * max(x2 - x1, 1.0)
    yi = np.clip(ys.astype(int), 0, h - 1)
    xi = np.clip(xs.astype(int), 0, w - 1)
    return mask[yi[:, None], xi[None, :]] > 0.5


def mask_mean_iou(pred_masks, pred_boxes, pred_classes, pred_scores,
                  gt_masks, gt_boxes, gt_classes, iou_threshold=0.5):
    """Mean ROI-frame mask IoU over box-matched detections (the mask half
    of `mrcnn/utils.py` compute_ap's `pred_masks`/`gt_masks` overlap path,
    evaluated in the mask head's own 28×28 frame). Unmatched detections
    and unmatched GT contribute nothing (box quality is mAP's job)."""
    if len(gt_boxes) == 0 or len(pred_boxes) == 0:
        return 0.0
    pred_match, _, order = match_predictions(
        pred_boxes, pred_classes, pred_scores, gt_boxes, gt_classes,
        iou_threshold,
    )
    ious = []
    for rank, j in enumerate(pred_match):
        if j < 0:
            continue
        i = order[rank]
        pm = np.asarray(pred_masks[i]) > 0.5
        gm = _crop_mask_np(np.asarray(gt_masks[j]), pred_boxes[i], pm.shape[0])
        union = (pm | gm).sum()
        ious.append((pm & gm).sum() / max(union, 1))
    return float(np.mean(ious)) if ious else 0.0


def compute_map_range(pred_boxes, pred_classes, pred_scores, gt_boxes, gt_classes,
                      thresholds=None):
    """COCO mAP@[.5:.95] (`mrcnn/utils.py:758-774`)."""
    if thresholds is None:
        thresholds = np.arange(0.5, 1.0, 0.05)
    aps = [
        compute_ap(pred_boxes, pred_classes, pred_scores, gt_boxes, gt_classes, t)[0]
        for t in thresholds
    ]
    return float(np.mean(aps))

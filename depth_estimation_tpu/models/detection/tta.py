"""Test-time augmentation for detection: hflip + multi-scale inference.

Capability counterpart of the reference's bbox/mask augmentation engine
(`mask-rcnn.pytorch/lib/core/test.py` — `im_detect_bbox_aug:192-288`,
`im_detect_bbox_hflip:289-312`, `im_detect_bbox_scale:313-328`; merge by
union + final NMS). TPU-first design: every augmented view is a separate
static-shape jitted program (one compile per scale, cached), detections
from all views are concatenated into one fixed-size set, and a single
class-aware NMS produces the final padded detection list — no dynamic
box counts anywhere.

Boxes are (x1, y1, x2, y2) pixel coordinates (`ops/detection.py`).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from ...ops.detection import nms

__all__ = ["hflip_boxes", "detect_augmented"]


@lru_cache(maxsize=16)
def _infer_fn(model):
    # One jitted apply per model instance (flax modules are hashable frozen
    # dataclasses): repeated detect_augmented calls hit jit's own
    # shape-keyed cache instead of retracing — remote TPU compiles are
    # minutes each, so a fresh jax.jit per call would be ruinous.
    return jax.jit(lambda p, im: model.apply(p, im, train=False))


def hflip_boxes(boxes: jax.Array, width: int) -> jax.Array:
    """Map boxes detected on a horizontally flipped image back to the
    original frame (`lib/core/test.py:289-312` box_utils.flip_boxes)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    return jnp.stack([width - x2, y1, width - x1, y2], axis=-1)


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _merged_nms(num_det, boxes, scores, extent, nms_thresh, score_thresh,
                classes=None):
    # class-aware NMS: offset each class's boxes into a disjoint coordinate
    # slab (stride > the image extent) so one NMS call suppresses within
    # classes only (Detectron's per-class loop, vectorized;
    # `lib/core/test.py:161-176` equivalent).
    offset = classes.astype(boxes.dtype)[:, None] * (extent + 1.0)
    keep, valid = nms(
        boxes + offset, scores, nms_thresh, num_det, score_threshold=score_thresh
    )
    safe = jnp.maximum(keep, 0)
    return (
        jnp.where(valid[:, None], boxes[safe], 0.0),
        jnp.where(valid, classes[safe], 0),
        jnp.where(valid, scores[safe], 0.0),
        valid,
    )


def detect_augmented(
    model,
    params,
    image: jax.Array,
    hflip: bool = True,
    scales: tuple[float, ...] = (),
    nms_thresh: float = 0.5,
    score_thresh: float = 0.05,
    infer_fn=None,
):
    """Run detection over augmented views and merge.

    Args:
      model: a `MaskRCNN` (or compatible) flax module.
      params: its params pytree.
      image: (h, w, 3) float image.
      hflip: include the horizontally flipped view
        (`im_detect_bbox_hflip`).
      scales: extra resize factors, e.g. (0.75, 1.25)
        (`im_detect_bbox_scale`); each is one cached compile.
      infer_fn: optional prebuilt `(params, image) -> detections` jitted
        callable; defaults to a per-model cached `jax.jit` of
        `model.apply(..., train=False)`.

    Returns dict(boxes, classes, scores, valid) — fixed size
    `model.num_detections`, merged from all views by class-aware NMS
    (the union+NMS merge of `im_detect_bbox_aug`, `heur='UNION'`).
    """
    h, w = image.shape[:2]
    infer = infer_fn if infer_fn is not None else _infer_fn(model)

    views = []  # (out, unmap) pairs

    out0 = infer(params, image)
    views.append((out0, lambda b: b))

    if hflip:
        out_f = infer(params, image[:, ::-1])
        views.append((out_f, lambda b: hflip_boxes(b, w)))

    for s in scales:
        hs, ws = int(round(h * s)), int(round(w * s))
        scaled = jax.image.resize(image, (hs, ws, image.shape[2]), "linear")
        out_s = infer(params, scaled)
        sy, sx = h / hs, w / ws
        views.append(
            (out_s, lambda b, sy=sy, sx=sx: b * jnp.asarray([sx, sy, sx, sy]))
        )

    boxes = jnp.concatenate([unmap(o["boxes"]) for o, unmap in views])
    classes = jnp.concatenate([o["classes"] for o, _ in views])
    # invalid slots carry score 0 and are dropped by the score threshold
    scores = jnp.concatenate(
        [jnp.where(o["valid"], o["scores"], 0.0) for o, _ in views]
    )

    num_det = out0["boxes"].shape[0]
    fb, fc, fs, valid = _merged_nms(
        num_det, boxes, scores, float(max(h, w)), nms_thresh,
        max(score_thresh, 1e-6), classes=classes,
    )
    return {"boxes": fb, "classes": fc, "scores": fs, "valid": valid}

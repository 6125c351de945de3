"""Anchor generation for FPN levels, fixed-shape.

Semantics of `mask-rcnn.pytorch/lib/modeling/generate_anchors.py` (scales ×
aspect ratios per cell) and `Mask_RCNN/mrcnn/utils.py:592-654` (pyramid
anchors): one scale per FPN level, anchors centered on feature cells,
returned as (x1, y1, x2, y2) image coordinates.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["cell_anchors", "pyramid_anchors"]


def cell_anchors(scale: float, ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """(A, 4) anchors centered at origin for one scale and each ratio."""
    out = []
    for r in ratios:
        h = scale * np.sqrt(r)
        w = scale / np.sqrt(r)
        out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.asarray(out, np.float32)


def pyramid_anchors(
    feature_shapes,  # [(h_l, w_l)] per level
    strides,  # [stride_l]
    scales,  # [scale_l]
    ratios=(0.5, 1.0, 2.0),
):
    """Concatenated (ΣA_l·h_l·w_l, 4) anchors over all levels (host-side
    numpy; anchors are static for fixed image size)."""
    all_anchors = []
    for (h, w), stride, scale in zip(feature_shapes, strides, scales):
        base = cell_anchors(scale, ratios)  # (A, 4)
        ys = (np.arange(h) + 0.5) * stride
        xs = (np.arange(w) + 0.5) * stride
        cx, cy = np.meshgrid(xs, ys)
        centers = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
        anchors = (centers + base[None]).reshape(-1, 4)
        all_anchors.append(anchors.astype(np.float32))
    return jnp.asarray(np.concatenate(all_anchors, axis=0))

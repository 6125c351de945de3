"""Detection primitives: box ops, NMS, ROI-Align — fixed-shape, XLA-native.

TPU equivalents of the reference's CUDA detection ops (SURVEY.md §2.2):
- `nms`: replaces the bitmask-parallel CUDA kernel
  (`mask-rcnn.pytorch/lib/model/nms/src/nms_cuda_kernel.cu`) with a
  fixed-trip-count suppression scan over a precomputed IoU matrix — no
  dynamic shapes, fully differentiable-adjacent (indices out).
- `roi_align`: replaces the bilinear ROI-Align CUDA kernel
  (`lib/model/roi_align/src/roi_align_kernel.cu` and the Caffe2-aligned
  copy with `sampling_ratio`) with gather-based bilinear sampling —
  vectorized over ROIs/bins/samples, differentiable by construction (no
  hand-written backward needed, unlike `functions/roi_align.py:7-47`).
- box utilities: IoU matrix, Detectron-style delta encode/decode, clip
  (semantics of `lib/utils/boxes.py` backed by Cython there).

Boxes are (x1, y1, x2, y2) float, pixel coordinates.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "box_area",
    "iou_matrix",
    "nms",
    "roi_align",
    "roi_align_pyramid",
    "encode_boxes",
    "decode_boxes",
    "clip_boxes",
]


def box_area(boxes: jax.Array) -> jax.Array:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 4) × (M, 4) → (N, M) IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.5,
    max_outputs: int = 100,
    score_threshold: float = -jnp.inf,
):
    """Greedy NMS with static output size.

    Returns (indices, valid): (max_outputs,) int32 indices into `boxes`
    (padded with -1) and a boolean validity mask. Matches greedy
    highest-score-first suppression semantics of the CUDA kernel.
    """
    n = boxes.shape[0]
    iou = iou_matrix(boxes, boxes)
    alive = scores > score_threshold

    def pick(state, _):
        alive, = state
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > -jnp.inf
        # suppress everything overlapping the pick (including itself)
        suppress = iou[best] > iou_threshold
        alive = alive & ~suppress & ~(jnp.arange(n) == best)
        idx = jnp.where(ok, best, -1).astype(jnp.int32)
        return (alive,), (idx, ok)

    (_,), (idxs, valid) = jax.lax.scan(pick, (alive,), None, length=max_outputs)
    return idxs, valid


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    features: jax.Array,
    boxes: jax.Array,
    output_size: tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jax.Array:
    """Bilinear ROI-Align.

    Args:
      features: (h, w, c) feature map.
      boxes: (R, 4) ROIs in input-image coordinates.
      output_size: (ph, pw) pooled bins.
      spatial_scale: feature-map stride scale (e.g. 1/16).
      sampling_ratio: samples per bin edge (Caffe2-aligned semantics of the
        reference's second ROI-Align copy).

    Returns (R, ph, pw, c), averaging sampling_ratio² bilinear samples per
    bin. Differentiable in both features and boxes.
    """
    h, w, c = features.shape
    ph, pw = output_size
    s = sampling_ratio

    scaled = boxes * spatial_scale
    x1, y1, x2, y2 = scaled[:, 0], scaled[:, 1], scaled[:, 2], scaled[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    # sample grid: for bin (i, j), samples at y1 + (i + (k+0.5)/s)·bin_h
    ks = (jnp.arange(s) + 0.5) / s  # (s,)
    iy = y1[:, None, None] + (jnp.arange(ph)[None, :, None] + ks[None, None, :]) * bin_h[:, None, None]
    ix = x1[:, None, None] + (jnp.arange(pw)[None, :, None] + ks[None, None, :]) * bin_w[:, None, None]
    # (R, ph, s) and (R, pw, s) → full grids (R, ph, s, pw, s)
    yy = iy[:, :, :, None, None]
    xx = ix[:, None, None, :, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)

    def bilinear(yq, xq):
        y0 = jnp.floor(yq)
        x0 = jnp.floor(xq)
        wy1 = yq - y0
        wx1 = xq - x0
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        inb = (yq >= -1) & (yq <= h) & (xq >= -1) & (xq <= w)
        f00 = features[y0i, x0i]
        f01 = features[y0i, x1i]
        f10 = features[y1i, x0i]
        f11 = features[y1i, x1i]
        val = (
            f00 * ((1 - wy1) * (1 - wx1))[..., None]
            + f01 * ((1 - wy1) * wx1)[..., None]
            + f10 * (wy1 * (1 - wx1))[..., None]
            + f11 * (wy1 * wx1)[..., None]
        )
        return jnp.where(inb[..., None], val, 0.0)

    samples = bilinear(yy, xx)  # (R, ph, s, pw, s, c)
    return samples.mean(axis=(2, 4))


def roi_align_pyramid(
    feats,
    boxes: jax.Array,
    levels: jax.Array,
    strides,
    output_size: tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
) -> jax.Array:
    """ROI-Align against a feature PYRAMID in one pass.

    Fixed-shape alternative to both the reference's per-level
    gather/re-scatter (`collect_and_distribute_fpn_rpn_proposals.py`) and
    the compute-all-levels-then-select form (4× the alignment work, which
    dominates at reference-scale R≥512 proposals): the level maps are
    flattened into ONE (ΣHᵢWᵢ, C) row buffer, each box's sample
    coordinates are computed in its assigned level's frame (per-box
    scale/extent gathered from tiny static tables), and a single bilinear
    gather with per-level row offsets reads exactly the samples needed —
    1× work, no dynamic partitioning.

    Args:
      feats: list of (Hᵢ, Wᵢ, C) maps (same C).
      boxes: (R, 4) ROIs in input-image coordinates.
      levels: (R,) int32 pyramid index in [0, len(feats)).
      strides: per-level feature strides (e.g. (4, 8, 16, 32)).

    Returns (R, ph, pw, C); same semantics as `roi_align` per box at its
    level. Differentiable in feats and boxes.
    """
    C = feats[0].shape[-1]
    Hs = np.asarray([f.shape[0] for f in feats], np.int32)
    Ws = np.asarray([f.shape[1] for f in feats], np.int32)
    offs = np.concatenate([[0], np.cumsum(Hs.astype(np.int64) * Ws)]).astype(
        np.int32
    )
    flat = jnp.concatenate([f.reshape(-1, C) for f in feats], axis=0)
    sc = jnp.asarray(1.0 / np.asarray(strides, np.float32))[levels]  # (R,)
    h_r = jnp.asarray(Hs)[levels].astype(boxes.dtype)
    w_r = jnp.asarray(Ws)[levels].astype(boxes.dtype)
    wi_r = jnp.asarray(Ws)[levels]
    o_r = jnp.asarray(offs[:-1])[levels]

    ph, pw = output_size
    s = sampling_ratio
    scaled = boxes * sc[:, None]
    x1, y1, x2, y2 = scaled[:, 0], scaled[:, 1], scaled[:, 2], scaled[:, 3]
    bin_w = jnp.maximum(x2 - x1, 1.0) / pw
    bin_h = jnp.maximum(y2 - y1, 1.0) / ph
    ks = (jnp.arange(s) + 0.5) / s
    iy = y1[:, None, None] + (jnp.arange(ph)[None, :, None] + ks[None, None, :]) * bin_h[:, None, None]
    ix = x1[:, None, None] + (jnp.arange(pw)[None, :, None] + ks[None, None, :]) * bin_w[:, None, None]
    yy = iy[:, :, :, None, None]
    xx = ix[:, None, None, :, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)
    hh = h_r[:, None, None, None, None]
    ww = w_r[:, None, None, None, None]
    wi = wi_r[:, None, None, None, None]
    oo = o_r[:, None, None, None, None]

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy1 = yy - y0
    wx1 = xx - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, (hh - 1).astype(jnp.int32))
    y1i = jnp.minimum(y0i + 1, (hh - 1).astype(jnp.int32))
    x0i = jnp.clip(x0.astype(jnp.int32), 0, (ww - 1).astype(jnp.int32))
    x1i = jnp.minimum(x0i + 1, (ww - 1).astype(jnp.int32))
    inb = (yy >= -1) & (yy <= hh) & (xx >= -1) & (xx <= ww)
    f00 = flat[oo + y0i * wi + x0i]
    f01 = flat[oo + y0i * wi + x1i]
    f10 = flat[oo + y1i * wi + x0i]
    f11 = flat[oo + y1i * wi + x1i]
    val = (
        f00 * ((1 - wy1) * (1 - wx1))[..., None]
        + f01 * ((1 - wy1) * wx1)[..., None]
        + f10 * (wy1 * (1 - wx1))[..., None]
        + f11 * (wy1 * wx1)[..., None]
    )
    samples = jnp.where(inb[..., None], val, 0.0)  # (R, ph, s, pw, s, C)
    return samples.mean(axis=(2, 4))


# --- Detectron-style box regression targets ------------------------------

BBOX_XFORM_CLIP = 4.135  # log(1000/16), the reference's clamp


def encode_boxes(boxes: jax.Array, gt: jax.Array, weights=(1.0, 1.0, 1.0, 1.0)):
    """(dx, dy, dw, dh) regression targets (`lib/utils/boxes.py` semantics)."""
    wx, wy, ww, wh = weights
    bw = boxes[:, 2] - boxes[:, 0] + 1.0
    bh = boxes[:, 3] - boxes[:, 1] + 1.0
    bx = boxes[:, 0] + 0.5 * bw
    by = boxes[:, 1] + 0.5 * bh
    gw = gt[:, 2] - gt[:, 0] + 1.0
    gh = gt[:, 3] - gt[:, 1] + 1.0
    gx = gt[:, 0] + 0.5 * gw
    gy = gt[:, 1] + 0.5 * gh
    return jnp.stack(
        [
            wx * (gx - bx) / bw,
            wy * (gy - by) / bh,
            ww * jnp.log(gw / bw),
            wh * jnp.log(gh / bh),
        ],
        axis=1,
    )


def decode_boxes(boxes: jax.Array, deltas: jax.Array, weights=(1.0, 1.0, 1.0, 1.0)):
    """Apply regression deltas to anchors/proposals."""
    wx, wy, ww, wh = weights
    bw = boxes[:, 2] - boxes[:, 0] + 1.0
    bh = boxes[:, 3] - boxes[:, 1] + 1.0
    bx = boxes[:, 0] + 0.5 * bw
    by = boxes[:, 1] + 0.5 * bh
    dx, dy, dw, dh = deltas[:, 0] / wx, deltas[:, 1] / wy, deltas[:, 2] / ww, deltas[:, 3] / wh
    dw = jnp.clip(dw, -BBOX_XFORM_CLIP, BBOX_XFORM_CLIP)
    dh = jnp.clip(dh, -BBOX_XFORM_CLIP, BBOX_XFORM_CLIP)
    cx = dx * bw + bx
    cy = dy * bh + by
    nw = jnp.exp(dw) * bw
    nh = jnp.exp(dh) * bh
    return jnp.stack(
        [cx - 0.5 * nw, cy - 0.5 * nh, cx + 0.5 * nw - 1.0, cy + 0.5 * nh - 1.0],
        axis=1,
    )


def clip_boxes(boxes: jax.Array, h: int, w: int) -> jax.Array:
    return jnp.stack(
        [
            jnp.clip(boxes[:, 0], 0, w - 1),
            jnp.clip(boxes[:, 1], 0, h - 1),
            jnp.clip(boxes[:, 2], 0, w - 1),
            jnp.clip(boxes[:, 3], 0, h - 1),
        ],
        axis=1,
    )


@partial(jax.jit, static_argnames=("output_size",))
def roi_pool_max(
    features: jax.Array,
    boxes: jax.Array,
    output_size: tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    samples: int = 4,
) -> jax.Array:
    """Max ROI pooling (capability of
    `mask-rcnn.pytorch/lib/model/roi_pooling/src/roi_pooling_kernel.cu`):
    max over a dense bilinear sample grid per bin — fixed-shape, smooth
    enough for gradients (max of samples, not of integer cells)."""
    h, w, c = features.shape
    ph, pw = output_size
    s = samples
    scaled = boxes * spatial_scale
    x1, y1 = scaled[:, 0], scaled[:, 1]
    bin_w = jnp.maximum(scaled[:, 2] - x1, 1.0) / pw
    bin_h = jnp.maximum(scaled[:, 3] - y1, 1.0) / ph
    ks = (jnp.arange(s) + 0.5) / s
    iy = y1[:, None, None] + (jnp.arange(ph)[None, :, None] + ks[None, None, :]) * bin_h[:, None, None]
    ix = x1[:, None, None] + (jnp.arange(pw)[None, :, None] + ks[None, None, :]) * bin_w[:, None, None]
    yy = iy[:, :, :, None, None]
    xx = ix[:, None, None, :, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 1)
    vals = features[y0, x0]  # nearest-cell sample (max-pool is cell-based)
    return vals.max(axis=(2, 4))


@partial(jax.jit, static_argnames=("output_size",))
def roi_crop(
    features: jax.Array,
    boxes: jax.Array,
    output_size: tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
) -> jax.Array:
    """STN-style bilinear ROI crop (capability of
    `mask-rcnn.pytorch/lib/model/roi_crop/src/roi_crop_cuda_kernel.cu` +
    `gridgen.py` affine grids): sample a regular (ph × pw) grid of exact
    bilinear taps spanning each box — one sample per output cell (vs
    ROI-Align's averaged sub-samples)."""
    h, w, c = features.shape
    ph, pw = output_size
    scaled = boxes * spatial_scale
    x1, y1, x2, y2 = scaled[:, 0], scaled[:, 1], scaled[:, 2], scaled[:, 3]
    ys = y1[:, None] + (jnp.arange(ph) + 0.5) / ph * jnp.maximum(y2 - y1, 1.0)[:, None]
    xs = x1[:, None] + (jnp.arange(pw) + 0.5) / pw * jnp.maximum(x2 - x1, 1.0)[:, None]
    yy = ys[:, :, None]
    xx = xs[:, None, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)  # (R, ph, pw)
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0 + 1, 0, h - 1)
    x1i = jnp.clip(x0 + 1, 0, w - 1)
    wy = yy - jnp.floor(yy)
    wx = xx - jnp.floor(xx)
    out = (
        features[y0, x0] * ((1 - wy) * (1 - wx))[..., None]
        + features[y0, x1i] * ((1 - wy) * wx)[..., None]
        + features[y1i, x0] * (wy * (1 - wx))[..., None]
        + features[y1i, x1i] * (wy * wx)[..., None]
    )
    return out

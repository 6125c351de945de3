"""Detection op tests: NMS vs naive greedy, ROI-Align vs manual bilinear,
box encode/decode roundtrip, mask-guided depth on synthetic shifts."""
import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.models.maskdepth import (
    composite_mask_depth,
    phase_correlation_offset,
)
from depth_estimation_tpu.ops.detection import (
    clip_boxes,
    decode_boxes,
    encode_boxes,
    iou_matrix,
    nms,
    roi_align,
)


def naive_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    iou = np.asarray(iou_matrix(jnp.asarray(boxes), jnp.asarray(boxes)))
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thr
    return keep


def test_nms_matches_naive(rng):
    n = 40
    centers = rng.rand(n, 2) * 50
    sizes = rng.rand(n, 2) * 10 + 2
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1)
    scores = rng.rand(n)
    idxs, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.3, max_outputs=n)
    got = [int(i) for i, v in zip(np.asarray(idxs), np.asarray(valid)) if v]
    want = naive_nms(boxes, scores, 0.3)
    assert got == want


def test_roi_align_constant_field():
    # On a constant feature map every pooled value equals the constant.
    feat = jnp.full((16, 16, 3), 2.5)
    boxes = jnp.asarray([[2.0, 2.0, 10.0, 10.0], [0.0, 0.0, 15.0, 15.0]])
    out = roi_align(feat, boxes, output_size=(4, 4))
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-6)


def test_roi_align_linear_gradient_field():
    # A linear ramp in x: pooled bin centers must reproduce the ramp.
    h = w = 32
    xs = jnp.arange(w, dtype=jnp.float32)
    feat = jnp.broadcast_to(xs[None, :, None], (h, w, 1))
    box = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])
    out = np.asarray(roi_align(feat, box, output_size=(4, 4), sampling_ratio=2))[0, :, :, 0]
    bin_w = 16.0 / 4
    expected_cols = 8.0 + (np.arange(4) + 0.5) * bin_w
    np.testing.assert_allclose(out.mean(axis=0), expected_cols, rtol=1e-5)


def test_roi_align_differentiable():
    feat = jnp.asarray(np.random.RandomState(0).rand(8, 8, 2).astype(np.float32))
    box = jnp.asarray([[1.0, 1.0, 6.0, 6.0]])
    g = jax.grad(lambda f: roi_align(f, box, (2, 2)).sum())(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_box_encode_decode_roundtrip(rng):
    anchors = np.abs(rng.rand(20, 4)) * 20
    anchors[:, 2:] = anchors[:, :2] + np.abs(rng.rand(20, 2)) * 30 + 5
    gt = anchors + rng.randn(20, 4) * 2
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 1)
    deltas = encode_boxes(jnp.asarray(anchors), jnp.asarray(gt))
    rec = np.asarray(decode_boxes(jnp.asarray(anchors), deltas))
    np.testing.assert_allclose(rec, gt, rtol=1e-5, atol=1e-4)


def test_clip_boxes():
    boxes = jnp.asarray([[-5.0, -5.0, 100.0, 100.0]])
    out = np.asarray(clip_boxes(boxes, 50, 60))
    np.testing.assert_allclose(out, [[0, 0, 59, 49]])


def test_phase_correlation_recovers_shift(rng):
    h, w, s = 64, 96, 7
    img = rng.rand(h, w, 3)
    shifted = np.roll(img, -s, axis=1)  # content moves left by s
    got = int(phase_correlation_offset(jnp.asarray(img), jnp.asarray(shifted)))
    assert got == s


def test_composite_mask_depth(rng):
    h, w = 48, 64
    left = jnp.asarray(rng.rand(h, w, 3))
    right = jnp.asarray(np.roll(np.asarray(left), -4, axis=1))
    masks = np.zeros((2, h, w))
    masks[0, 10:30, 10:30] = 1
    masks[1, 20:40, 30:50] = 1
    out = np.asarray(composite_mask_depth(left, right, jnp.asarray(masks)))
    assert out.shape == (h, w)
    assert (out[0, 0] == 0) and np.isfinite(out).all()
    # overlap region takes the later mask's value
    assert out[25, 35] == out[35, 45]


def test_roi_crop_constant_and_gradient_fields():
    from depth_estimation_tpu.ops.detection import roi_crop

    feat = jnp.full((16, 16, 2), 3.0)
    out = roi_crop(feat, jnp.asarray([[2.0, 2.0, 10.0, 10.0]]), (4, 4))
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-6)
    xs = jnp.arange(32, dtype=jnp.float32)
    ramp = jnp.broadcast_to(xs[None, :, None], (32, 32, 1))
    out2 = np.asarray(roi_crop(ramp, jnp.asarray([[8.0, 8.0, 24.0, 24.0]]), (4, 4)))[0, 0, :, 0]
    want = 8.0 + (np.arange(4) + 0.5) * 4.0
    np.testing.assert_allclose(out2, want, rtol=1e-4)


def test_roi_align_pyramid_matches_per_level():
    """The flattened-pyramid single-gather form equals per-level
    roi_align at each box's assigned level (round-5: replaces the 4x
    align-all-then-select in pyramid_roi_align)."""
    from depth_estimation_tpu.ops.detection import roi_align, roi_align_pyramid

    rng = np.random.RandomState(3)
    strides = (4, 8, 16, 32)
    H = 64
    feats = [jnp.asarray(rng.randn(H // s_, H // s_, 6).astype(np.float32))
             for s_ in strides]
    R = 12
    boxes = np.sort(rng.rand(R, 2, 2) * H, axis=1).reshape(R, 4)[:, [0, 2, 1, 3]]
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 2.0)
    boxes = jnp.asarray(boxes, jnp.float32)
    levels = jnp.asarray(rng.randint(0, 4, R), jnp.int32)
    got = roi_align_pyramid(feats, boxes, levels, strides, (7, 7))
    for lv in range(4):
        want = roi_align(feats[lv], boxes, (7, 7), spatial_scale=1.0 / strides[lv])
        sel = np.asarray(levels) == lv
        np.testing.assert_allclose(np.asarray(got)[sel], np.asarray(want)[sel],
                                   rtol=1e-5, atol=1e-5)

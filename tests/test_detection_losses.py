"""Detection loss tests: matching logic, loss sanity, and gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.models.detection.losses import (
    mask_loss,
    match_anchors,
    roi_losses,
    rpn_losses,
    smooth_l1,
)


def test_smooth_l1_branches():
    x = jnp.asarray([0.0, 0.05, 1.0])
    out = np.asarray(smooth_l1(x, beta=1 / 9))
    assert out[0] == 0
    np.testing.assert_allclose(out[1], 0.5 * 0.05**2 / (1 / 9), rtol=1e-6)
    np.testing.assert_allclose(out[2], 1.0 - 0.5 / 9, rtol=1e-6)


def test_match_anchors_labels():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [100, 100, 110, 110], [0, 0, 9, 9], [50, 50, 52, 52]],
        jnp.float32,
    )
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    valid = jnp.asarray([True])
    labels, matched = match_anchors(anchors, gt, valid)
    labels = np.asarray(labels)
    assert labels[0] == 1  # exact IoU 1
    assert labels[1] == 0  # no overlap
    assert labels[2] == 1  # IoU 0.81 ≥ 0.7
    assert labels[3] == 0


def test_rpn_losses_perfect_predictions_low_loss():
    anchors = jnp.asarray([[0, 0, 10, 10], [30, 30, 44, 44]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    valid = jnp.asarray([True])
    good_logits = jnp.asarray([8.0, -8.0])
    zero_deltas = jnp.zeros((2, 4))
    cls, reg = rpn_losses(good_logits, zero_deltas, anchors, gt, valid)
    assert float(cls) < 1e-3
    assert float(reg) < 1e-6  # positive anchor == its GT → zero targets
    bad_logits = jnp.asarray([-8.0, 8.0])
    cls_bad, _ = rpn_losses(bad_logits, zero_deltas, anchors, gt, valid)
    assert float(cls_bad) > 5.0


def test_roi_and_mask_losses_grad_flow():
    rng = np.random.RandomState(0)
    R, K, G = 6, 4, 2
    proposals = jnp.asarray(np.abs(rng.rand(R, 4)) * 20, jnp.float32)
    proposals = proposals.at[:, 2:].set(proposals[:, :2] + 10)
    gt_boxes = proposals[:G] + 1.0
    gt_classes = jnp.asarray([1, 2])
    gt_valid = jnp.asarray([True, True])
    prop_valid = jnp.ones((R,), bool)

    def loss_fn(params):
        scores, deltas, mlogits = params
        c, r, tgt_cls, best_gt, fg = roi_losses(
            scores, deltas, proposals, prop_valid, gt_boxes, gt_classes, gt_valid
        )
        tgt_masks = jnp.ones((R, 7, 7))
        m = mask_loss(mlogits, tgt_cls, tgt_masks, fg)
        return c + r + m

    params = (
        jnp.asarray(rng.randn(R, K), jnp.float32),
        jnp.asarray(rng.randn(R, K, 4), jnp.float32) * 0.01,
        jnp.asarray(rng.randn(R, 7, 7, K), jnp.float32),
    )
    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_roi_mask_targets_crops_matched_instance():
    """A proposal exactly on a GT box must get that instance's mask
    rendered in ROI frame (`mrcnn/model.py:623-686` crop semantics)."""
    from depth_estimation_tpu.models.detection.losses import roi_mask_targets

    h = w = 32
    masks = np.zeros((2, h, w), np.float32)
    masks[0, 4:12, 4:12] = 1.0  # instance 0: square at (4..12)
    masks[1, 20:28, 16:30] = 1.0
    proposals = jnp.asarray([[4, 4, 12, 12], [16, 20, 30, 28]], jnp.float32)
    best_gt = jnp.asarray([0, 1], jnp.int32)
    tgt = jax.jit(
        lambda m, b, p: roi_mask_targets(m, b, p, size=(14, 14))
    )(jnp.asarray(masks), best_gt, proposals)
    assert tgt.shape == (2, 14, 14)
    # proposal 0 covers exactly its instance: target nearly all ones
    assert float(tgt[0].mean()) > 0.8
    assert float(tgt[1].mean()) > 0.8
    # swap the match: the crop region of proposal 0 contains none of
    # instance 1 → target all zeros
    tgt_sw = roi_mask_targets(
        jnp.asarray(masks), jnp.asarray([1, 0], jnp.int32), proposals,
        size=(14, 14),
    )
    assert float(tgt_sw[0].sum()) == 0.0


def test_keypoint_targets_bin_mapping():
    from depth_estimation_tpu.models.detection.losses import keypoint_targets

    kps = jnp.asarray([[[10.0, 10.0], [19.9, 19.9], [50.0, 50.0]]])  # (1,3,2)
    vis = jnp.ones((1, 3), bool)
    proposals = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    best_gt = jnp.asarray([0], jnp.int32)
    xy, v = keypoint_targets(kps, vis, best_gt, proposals, heatmap_size=10)
    xy, v = np.asarray(xy), np.asarray(v)
    assert (xy[0, 0] == [0, 0]).all()  # top-left corner → bin (0,0)
    assert (xy[0, 1] == [9, 9]).all()  # just inside bottom-right → last bin
    assert v[0, 0] and v[0, 1] and not v[0, 2]  # outside ROI → invisible

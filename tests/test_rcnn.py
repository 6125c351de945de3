"""Detection model family tests: shapes, anchors, level assignment, and a
full jitted inference pass on random weights (structure/flow validation —
the reference's shapes-dataset role, SURVEY.md §4.6)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.models.detection.anchors import cell_anchors, pyramid_anchors
from depth_estimation_tpu.models.detection.backbone import FPN, ResNet, ResNetFPN
from depth_estimation_tpu.models.detection.rcnn import (
    MaskRCNN,
    fpn_level_for_boxes,
)


def test_cell_anchors_areas():
    a = cell_anchors(32.0)
    areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    np.testing.assert_allclose(areas, 32.0**2, rtol=1e-5)


def test_pyramid_anchors_count():
    shapes = [(8, 8), (4, 4)]
    anchors = pyramid_anchors(shapes, strides=[4, 8], scales=[32, 64])
    assert anchors.shape == (3 * (64 + 16), 4)
    # first anchors centered in the first cell
    cx = (anchors[0, 0] + anchors[0, 2]) / 2
    assert abs(float(cx) - 2.0) < 1e-5


def test_fpn_level_assignment():
    boxes = jnp.asarray(
        [
            [0, 0, 32, 32],      # small → level 2
            [0, 0, 224, 224],    # canonical → level 4
            [0, 0, 1000, 1000],  # huge → level 5 (clipped)
        ],
        jnp.float32,
    )
    levels = np.asarray(fpn_level_for_boxes(boxes))
    assert levels[0] == 2 and levels[1] == 4 and levels[2] == 5


def test_resnet_fpn_shapes():
    model = ResNetFPN(blocks=(1, 1, 1, 1), out_dim=32)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert len(feats) == 5
    # strides 4, 8, 16, 32, 64
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2, 1]
    assert all(f.shape[-1] == 32 for f in feats)


def test_maskrcnn_inference_flow():
    model = MaskRCNN(
        num_classes=5,
        blocks=(1, 1, 1, 1),
        fpn_dim=32,
        num_proposals=16,
        num_detections=8,
        score_thresh=-1.0,  # random weights: keep everything
    )
    img = jnp.asarray(np.random.RandomState(0).rand(64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    out = jax.jit(model.apply)(params, img)
    assert out["boxes"].shape == (8, 4)
    assert out["classes"].shape == (8,)
    assert out["masks"].shape == (8, 28, 28)
    assert out["proposals"].shape == (16, 4)
    b = np.asarray(out["boxes"])
    assert np.isfinite(b).all()
    assert (b[:, 2] >= b[:, 0] - 1e-5).all() and (b[:, 3] >= b[:, 1] - 1e-5).all()
    assert np.asarray(out["masks"]).min() >= 0 and np.asarray(out["masks"]).max() <= 1


def test_keypoint_head_and_loss():
    from depth_estimation_tpu.models.detection.rcnn import KeypointHead, keypoint_loss

    head = KeypointHead(num_keypoints=5, dim=32)
    feats = jnp.asarray(np.random.RandomState(0).rand(3, 14, 14, 16), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), feats)
    logits = jax.jit(head.apply)(params, feats)
    assert logits.shape == (3, 56, 56, 5)  # 4x upsampled heatmaps

    # loss: picking the argmax bin as target must give a lower loss than a
    # far-away bin, and gradients must flow to conv params
    m = logits.shape[1]
    flat = np.asarray(logits).reshape(3, m * m, 5)
    best = flat.argmax(axis=1)  # (3, 5)
    xy_good = jnp.stack([best % m, best // m], axis=-1).astype(jnp.float32)
    xy_bad = (xy_good + m // 2) % m
    vis = jnp.ones((3, 5), bool)
    fg = jnp.ones((3,), bool)
    l_good = float(keypoint_loss(logits, xy_good, vis, fg))
    l_bad = float(keypoint_loss(logits, xy_bad, vis, fg))
    assert l_good < l_bad

    def loss_fn(p):
        return keypoint_loss(head.apply(p, feats), xy_good, vis, fg)

    g = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)

    # masking: invisible keypoints contribute nothing
    l_masked = float(keypoint_loss(logits, xy_good, jnp.zeros((3, 5), bool), fg))
    assert l_masked == 0.0


def test_perclass_detections_two_classes_same_location():
    """Two overlapping objects of different classes on the same proposal
    must BOTH be emitted (`mrcnn/model.py:785-832` per-class semantics —
    the argmax-class simplification could only emit one)."""
    from depth_estimation_tpu.models.detection.rcnn import perclass_detections

    P, K = 4, 4
    probs = np.full((P, K), 1e-4, np.float32)
    # proposal 0: class 1 strong; proposal 1 (same box): class 2 strong
    probs[0, 1] = 0.9
    probs[1, 2] = 0.8
    probs[2, 0] = 0.99  # background-dominant proposal: no detection
    probs = jnp.asarray(probs)
    deltas = jnp.zeros((P, K, 4), jnp.float32)
    proposals = jnp.asarray(
        [[10, 10, 30, 30], [11, 11, 31, 31], [40, 40, 50, 50], [0, 0, 5, 5]],
        jnp.float32,
    )
    valid = jnp.asarray([True, True, True, False])
    boxes, cls, scores, ok = jax.jit(
        lambda p, d, pr, v: perclass_detections(p, d, pr, v, 64, 64, 8)
    )(probs, deltas, proposals, valid)
    got = sorted(
        (int(c), round(float(s), 3))
        for c, s, o in zip(np.asarray(cls), np.asarray(scores), np.asarray(ok))
        if o
    )
    assert (1, 0.9) in got and (2, 0.8) in got, got
    # the two survivors overlap heavily — class-aware NMS kept both
    kept = [b for b, o in zip(np.asarray(boxes), np.asarray(ok)) if o]
    assert len(got) == 2 and len(kept) == 2


def test_maskrcnn_keypoint_branch_and_gt_append():
    """num_keypoints>0 wires the keypoint branch through the model
    (`model_builder.py:110-124` capability): heatmap logits on the ROI set
    and decoded keypoints inside detection boxes at inference. GT-append
    places the GT boxes in the training proposal set."""
    model = MaskRCNN(
        num_classes=4, blocks=(1, 1, 1, 1), fpn_dim=32,
        num_proposals=16, num_detections=4, score_thresh=-1.0,
        num_keypoints=5,
    )
    img = jnp.asarray(np.random.RandomState(0).rand(64, 64, 3), jnp.float32)
    gt_boxes = jnp.asarray([[8, 8, 24, 24], [30, 30, 50, 50]], jnp.float32)
    gt_valid = jnp.asarray([True, True])
    params = model.init(
        jax.random.PRNGKey(0), img, train=True, gt_boxes=gt_boxes,
        gt_valid=gt_valid,
    )
    out_t = jax.jit(
        lambda p, im: model.apply(p, im, train=True, gt_boxes=gt_boxes,
                                  gt_valid=gt_valid)
    )(params, img)
    assert out_t["kp_logits"].shape == (16, 56, 56, 5)
    np.testing.assert_allclose(
        np.asarray(out_t["proposals"])[-2:], np.asarray(gt_boxes)
    )
    assert np.asarray(out_t["proposal_valid"])[-2:].all()

    out_i = jax.jit(lambda p, im: model.apply(p, im, train=False))(params, img)
    assert out_i["keypoints"].shape == (4, 5, 2)
    kp = np.asarray(out_i["keypoints"])
    b = np.asarray(out_i["boxes"])
    ok = np.asarray(out_i["valid"])
    for i in range(len(ok)):
        if ok[i] and (b[i, 2] - b[i, 0]) > 1 and (b[i, 3] - b[i, 1]) > 1:
            assert (kp[i, :, 0] >= b[i, 0] - 1e-3).all()
            assert (kp[i, :, 0] <= b[i, 2] + 1e-3).all()

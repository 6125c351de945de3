"""Test-time augmentation (hflip + multi-scale merge) for detection —
counterpart of the reference's `im_detect_bbox_aug` engine
(`mask-rcnn.pytorch/lib/core/test.py:192-328`)."""
import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.data.shapes import NUM_CLASSES, ShapesDetection
from depth_estimation_tpu.models.detection.rcnn import MaskRCNN
from depth_estimation_tpu.models.detection.tta import detect_augmented, hflip_boxes


def test_hflip_boxes_involution():
    b = jnp.asarray([[3.0, 5.0, 20.0, 30.0], [0.0, 0.0, 64.0, 64.0]])
    np.testing.assert_allclose(hflip_boxes(hflip_boxes(b, 64), 64), b)
    # a box at the left edge maps to the right edge
    np.testing.assert_allclose(
        hflip_boxes(jnp.asarray([[0.0, 10.0, 8.0, 20.0]]), 64),
        [[56.0, 10.0, 64.0, 20.0]],
    )


def test_detect_augmented_shapes():
    ds = ShapesDetection(num_items=1, h=64, w=64, max_shapes=2, seed=5)
    item = ds[0]
    model = MaskRCNN(
        num_classes=NUM_CLASSES, blocks=(1, 1, 1, 1), fpn_dim=32,
        num_proposals=16, num_detections=8, score_thresh=-1.0,
    )
    image = jnp.asarray(item["image"], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), image, train=False)

    out = detect_augmented(
        model, params, image, hflip=True, scales=(0.75,), score_thresh=1e-4
    )
    assert out["boxes"].shape == (8, 4)
    assert out["classes"].shape == (8,)
    v = np.asarray(out["valid"])
    boxes = np.asarray(out["boxes"])[v]
    assert (boxes[:, 0] <= boxes[:, 2]).all() and (boxes[:, 1] <= boxes[:, 3]).all()
    assert boxes.min() >= -1e-3 and boxes.max() <= 64 + 1e-3
    cls = np.asarray(out["classes"])[v]
    assert ((cls >= 1) & (cls < NUM_CLASSES)).all()
    # scores sorted descending among valid (greedy NMS picks best-first)
    sc = np.asarray(out["scores"])[v]
    assert (np.diff(sc) <= 1e-6).all()


def test_detect_augmented_mirror_consistency():
    """TTA of a mirrored image with mirrored augs yields mirrored boxes —
    the unmap logic must be exactly inverse to the flip."""
    ds = ShapesDetection(num_items=1, h=64, w=64, max_shapes=2, seed=9)
    item = ds[0]
    model = MaskRCNN(
        num_classes=NUM_CLASSES, blocks=(1, 1, 1, 1), fpn_dim=32,
        num_proposals=16, num_detections=8, score_thresh=-1.0,
    )
    image = jnp.asarray(item["image"], jnp.float32)
    params = model.init(jax.random.PRNGKey(1), image, train=False)

    out = detect_augmented(model, params, image, hflip=True, scales=())
    out_m = detect_augmented(model, params, image[:, ::-1], hflip=True, scales=())
    # the view set {id, flip} is closed under mirroring, so the merged
    # result of the mirrored image is the mirror of the merged result
    v, vm = np.asarray(out["valid"]), np.asarray(out_m["valid"])
    np.testing.assert_array_equal(v, vm)
    np.testing.assert_allclose(
        np.asarray(hflip_boxes(out_m["boxes"], 64))[vm],
        np.asarray(out["boxes"])[v],
        atol=1e-4,
    )

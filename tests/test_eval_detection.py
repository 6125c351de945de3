"""AP evaluation + shapes dataset tests."""
import numpy as np

from depth_estimation_tpu.data.shapes import NUM_CLASSES, ShapesDetection
from depth_estimation_tpu.train.eval_detection import compute_ap, compute_map_range


def test_perfect_predictions_ap_one():
    gt = np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], float)
    cls = np.asarray([1, 2])
    ap, _, _ = compute_ap(gt, cls, np.asarray([0.9, 0.8]), gt, cls)
    assert ap == 1.0
    assert compute_map_range(gt, cls, np.asarray([0.9, 0.8]), gt, cls) > 0.99


def test_wrong_class_zero_ap():
    gt = np.asarray([[0, 0, 10, 10]], float)
    ap, _, _ = compute_ap(gt, np.asarray([2]), np.asarray([0.9]), gt, np.asarray([1]))
    assert ap == 0.0


def test_partial_detection_ap():
    gt = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], float)
    cls = np.asarray([1, 1])
    # only first GT detected, plus one false positive with lower score
    pred = np.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], float)
    ap, _, _ = compute_ap(pred, cls, np.asarray([0.9, 0.5]), gt, cls)
    assert 0.4 < ap < 0.6  # recall caps at 0.5 with full precision first


def test_shifted_boxes_ap_depends_on_threshold():
    gt = np.asarray([[0, 0, 10, 10]], float)
    pred = np.asarray([[2, 2, 12, 12]], float)  # IoU ≈ 0.47
    cls = np.asarray([1])
    ap50, _, _ = compute_ap(pred, cls, np.asarray([0.9]), gt, cls, 0.4)
    ap75, _, _ = compute_ap(pred, cls, np.asarray([0.9]), gt, cls, 0.75)
    assert ap50 == 1.0 and ap75 == 0.0


def test_shapes_dataset_consistency():
    ds = ShapesDetection(num_items=4, h=48, w=48)
    item = ds.padded(0)
    assert item["image"].shape == (48, 48, 3)
    g = item["gt_valid"].sum()
    assert 1 <= g <= 3
    assert (item["classes_padded"][:g] >= 1).all()
    assert (item["classes_padded"][:g] < NUM_CLASSES).all()
    # masks lie inside their boxes
    for k in range(g):
        ys, xs = np.nonzero(item["masks"][k])
        if len(ys) == 0:
            continue  # fully occluded
        x1, y1, x2, y2 = item["boxes"][k]
        assert xs.min() >= x1 - 1 and xs.max() <= x2 + 1
        assert ys.min() >= y1 - 1 and ys.max() <= y2 + 1
    # deterministic
    again = ds.padded(0)
    np.testing.assert_array_equal(item["image"], again["image"])

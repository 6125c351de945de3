"""COCO-format loading with synthetic fixtures (no downloads)."""
import json

import numpy as np
import pytest

from depth_estimation_tpu.data.coco import COCODetection, decode_rle, rasterize_polygon


def test_rasterize_square():
    poly = np.asarray([[2, 2], [8, 2], [8, 8], [2, 8]], float)
    m = rasterize_polygon(poly, 12, 12)
    assert m[5, 5] and not m[0, 0] and not m[10, 10]
    assert 30 <= m.sum() <= 40  # ~6x6


def test_rasterize_triangle_partial():
    poly = np.asarray([[0, 0], [10, 0], [0, 10]], float)
    m = rasterize_polygon(poly, 12, 12)
    assert m[1, 1] and not m[9, 9]


def test_decode_rle_roundtrip():
    h, w = 4, 3
    mask = np.zeros((h, w), bool)
    mask[1:3, 1] = True
    # encode column-major
    flat = mask.T.reshape(-1)
    counts, run, val = [], 0, False
    for v in flat:
        if v == val:
            run += 1
        else:
            counts.append(run)
            run, val = 1, v
    counts.append(run)
    np.testing.assert_array_equal(decode_rle(counts, h, w), mask)


@pytest.fixture()
def coco_fixture(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(2):
        h, w = 32, 40
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{i}.png"
        )
        images.append({"id": i + 10, "file_name": f"{i}.png", "height": h, "width": w})
        annotations.append(
            {
                "id": 100 + i,
                "image_id": i + 10,
                "category_id": 7 if i == 0 else 3,
                "bbox": [4, 4, 12, 10],
                "segmentation": [[4, 4, 16, 4, 16, 14, 4, 14]],
                "iscrowd": 0,
            }
        )
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 3, "name": "cat"}, {"id": 7, "name": "dog"}],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    return str(img_dir), str(ann_path)


def test_coco_dataset(coco_fixture):
    root, ann = coco_fixture
    ds = COCODetection(root, ann)
    assert len(ds) == 2
    assert ds.num_classes == 3  # bg + 2
    item = ds[0]
    assert item["image"].shape == (32, 40, 3)
    np.testing.assert_allclose(item["boxes"], [[4, 4, 16, 14]])
    assert item["classes"][0] == ds.cat_to_contiguous[7] == 2  # sorted [3, 7]
    assert item["masks"].shape == (1, 32, 40)
    assert item["masks"][0, 8, 8] and not item["masks"][0, 30, 30]
    assert ds.class_names[2] == "dog"


def test_encode_rle_inverse_of_decode(rng=np.random.RandomState(3)):
    from depth_estimation_tpu.data.coco import encode_rle

    for _ in range(5):
        m = rng.rand(13, 7) > 0.6
        counts = encode_rle(m)
        assert all(c >= 0 for c in counts)
        assert sum(counts) == m.size
        np.testing.assert_array_equal(decode_rle(counts, 13, 7), m)
    # leading-one mask must start with a 0 count
    m = np.ones((2, 2), bool)
    assert encode_rle(m)[0] == 0


def test_rle_submission_roundtrip():
    from depth_estimation_tpu.data.coco import (
        rle_submission_decode,
        rle_submission_encode,
    )

    rng = np.random.RandomState(0)
    m = rng.rand(11, 9) > 0.5
    s = rle_submission_encode(m)
    assert all(int(v) >= 1 for v in s.split())  # 1-based pairs
    np.testing.assert_array_equal(rle_submission_decode(s, 11, 9), m)
    assert rle_submission_encode(np.zeros((4, 4), bool)) == ""


def test_masks_to_submission_overlap_resolution():
    from depth_estimation_tpu.data.coco import (
        masks_to_submission,
        rle_submission_decode,
    )

    h = w = 8
    a = np.zeros((h, w), bool); a[2:6, 2:6] = True
    b = np.zeros((h, w), bool); b[4:8, 4:8] = True
    lines = masks_to_submission("img7", np.stack([a, b]), [0.4, 0.9]).splitlines()
    assert len(lines) == 2 and all(l.startswith("img7, ") for l in lines)
    # higher-scoring b (first line) keeps the contested 4:6,4:6 block
    first = rle_submission_decode(lines[0].split(", ")[1], h, w)
    second = rle_submission_decode(lines[1].split(", ")[1], h, w)
    np.testing.assert_array_equal(first, b)
    np.testing.assert_array_equal(second, a & ~b)
    assert masks_to_submission("e", np.zeros((0, h, w), bool), []) == "e,"


def test_coco_padded_resizes_boxes(coco_fixture):
    root, ann = coco_fixture
    ds = COCODetection(root, ann)
    item = ds.padded(0, size=64, max_gt=4)
    assert item["image"].shape == (64, 64, 3)
    assert item["boxes_padded"].shape == (4, 4)
    assert item["gt_valid"].tolist() == [True, False, False, False]
    # bbox [4,4,12,10] on a 40x32 image scales by (64/40, 64/32)
    np.testing.assert_allclose(
        item["boxes_padded"][0], [4 * 64 / 40, 4 * 2, 16 * 64 / 40, 14 * 2], rtol=1e-6
    )
    # masks must be resized alongside the image, not left at original res
    assert item["masks"].shape[1:] == (64, 64)
    for m, b in zip(item["masks"], item["boxes"]):
        ys, xs = np.nonzero(m)
        if len(ys):
            assert xs.min() >= b[0] - 2 and xs.max() <= b[2] + 2
            assert ys.min() >= b[1] - 2 and ys.max() <= b[3] + 2


def test_train_detection_coco_runs(coco_fixture):
    from depth_estimation_tpu.train.experiments import train_detection_coco

    root, ann = coco_fixture
    params, hist = train_detection_coco(
        root, ann, num_steps=2, size=32, max_gt=4, lr=1e-3,
        model_kwargs=dict(num_proposals=16, num_detections=4),
    )
    assert len(hist["loss"]) == 2 and np.isfinite(hist["loss"]).all()
    assert hist["map50"] is not None


def test_grouped_batch_sampler_groups_and_covers():
    """Round-5 roi_data analog: batches never mix aspect groups, every
    index appears each epoch, epochs reshuffle deterministically."""
    from depth_estimation_tpu.data.loader import (GroupedBatchSampler,
                                                  aspect_ratio_groups)

    shapes = [(100, 200)] * 5 + [(200, 100)] * 7 + [(128, 128)] * 4
    groups = aspect_ratio_groups(shapes)
    assert len(set(groups[:5])) == 1 and len(set(groups[5:12])) == 1
    assert groups[0] != groups[5]
    s = GroupedBatchSampler(shapes, batch_size=4, seed=3)
    seen = set()
    for batch in s.epoch(0):
        assert len(batch) == 4
        assert len({groups[i] for i in batch}) == 1  # no group mixing
        seen.update(batch)
    assert seen == set(range(len(shapes)))  # full coverage
    assert s.epoch(1) != s.epoch(0)  # reshuffles
    assert s.epoch(1) == s.epoch(1)  # deterministic


def test_collate_detection_batch_padding():
    import numpy as np

    from depth_estimation_tpu.data.loader import collate_detection_batch

    rng = np.random.RandomState(0)
    items = []
    for h, w, g in ((60, 90, 2), (50, 80, 3)):
        items.append({
            "image": rng.rand(h, w, 3).astype(np.float32),
            "boxes": rng.rand(g, 4).astype(np.float32) * 40,
            "classes": rng.randint(1, 4, g),
            "masks": (rng.rand(g, h, w) > 0.5).astype(np.float32),
        })
    out = collate_detection_batch(items)
    H, W = out["pad_shape"]
    assert H % 32 == 0 and W % 32 == 0 and H >= 60 and W >= 90
    assert out["image"].shape == (2, H, W, 3)
    assert out["gt_valid"].sum() == 5
    # original pixels preserved; padding is the image mean
    np.testing.assert_array_equal(out["image"][0, :60, :90], items[0]["image"])
    assert np.allclose(out["image"][0, 60:, :],
                       items[0]["image"].mean(axis=(0, 1)), atol=1e-6)
    assert out["masks_padded"].shape == (2, 3, H, W)

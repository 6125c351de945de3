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


# ---------------------------------------------------------------------------
# Round-5: COCO-definition metric cross-validation. pycocotools is not
# installable in this image, so the oracle below is an INDEPENDENT
# implementation of the published COCO evaluation algorithm
# (cocodataset.org/#detection-eval), deliberately structured like
# cocoeval (per-image evalImgs over all thresholds at once → global
# accumulate with 101 recall bins) rather than like coco_map's
# per-category streaming loop. Agreement on randomized data validates
# the metric the reference's published numbers are defined under.
# ---------------------------------------------------------------------------


def _iou_np(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None] - inter, 1e-9)


def _oracle_coco_map(preds, gts, thrs, max_dets=100):
    """cocoeval-style oracle: evaluateImg + accumulate, minus crowd/area."""
    cats = sorted({int(c) for g in gts for c in g["classes"]})
    T = len(thrs)
    ap = np.full((T, len(cats)), np.nan)
    for ci, cat in enumerate(cats):
        eval_imgs = []
        total_gt = 0
        for p, g in zip(preds, gts):
            gi = np.where(np.asarray(g["classes"]) == cat)[0]
            di = np.where(np.asarray(p["classes"]) == cat)[0]
            dscore = np.asarray(p["scores"])[di]
            dsort = np.argsort(-dscore)[:max_dets]
            di = di[dsort]
            gb = np.asarray(g["boxes"], float)[gi]
            db = np.asarray(p["boxes"], float)[di]
            total_gt += len(gi)
            ious = _iou_np(db, gb) if len(db) and len(gb) else np.zeros((len(db), len(gb)))
            dtm = np.zeros((T, len(di)))
            gtm = np.zeros((T, len(gi)))
            for ti, t in enumerate(thrs):
                for d in range(len(di)):
                    iou = min(t, 1 - 1e-10)
                    m = -1
                    for gg in range(len(gi)):
                        if gtm[ti, gg] > 0:
                            continue
                        if ious[d, gg] < iou:
                            continue
                        iou = ious[d, gg]
                        m = gg
                    if m > -1:
                        dtm[ti, d] = 1
                        gtm[ti, m] = 1
            eval_imgs.append((dscore[dsort], dtm))
        if total_gt == 0:
            continue
        scores = np.concatenate([e[0] for e in eval_imgs]) if eval_imgs else np.zeros(0)
        dtms = (np.concatenate([e[1] for e in eval_imgs], axis=1)
                if eval_imgs else np.zeros((T, 0)))
        inds = np.argsort(-scores, kind="mergesort")
        dtms = dtms[:, inds]
        tps = np.cumsum(dtms, axis=1)
        fps = np.cumsum(1 - dtms, axis=1)
        for ti in range(T):
            nd = dtms.shape[1]
            rc = tps[ti] / total_gt
            pr = tps[ti] / np.maximum(tps[ti] + fps[ti], 1e-12)
            q = np.zeros(101)
            pr = pr.tolist()
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            rthrs = np.linspace(0, 1, 101)
            inds2 = np.searchsorted(rc, rthrs, side="left")
            for ri, pi in enumerate(inds2):
                if pi < nd:
                    q[ri] = pr[pi]
            ap[ti, ci] = q.mean()
    valid = ~np.isnan(ap)
    m = float(np.mean(ap[valid])) if valid.any() else 0.0
    t50 = int(np.argmin(np.abs(np.asarray(thrs) - 0.5)))
    row = ap[t50][~np.isnan(ap[t50])]
    return m, (float(np.mean(row)) if len(row) else 0.0)


def _random_dataset(rng, n_imgs=6, n_cls=3):
    preds, gts = [], []
    for _ in range(n_imgs):
        G = rng.randint(1, 6)
        gb = np.sort(rng.rand(G, 2, 2) * 100, axis=1).reshape(G, 4)
        gb[:, 2:] = gb[:, :2] + np.maximum(gb[:, 2:] - gb[:, :2], 5.0)
        gc = rng.randint(1, n_cls + 1, G)
        P = rng.randint(0, 9)
        keep = rng.rand(P) < 0.7
        pb = np.zeros((P, 4))
        pc = np.zeros(P, np.int64)
        for i in range(P):
            if keep[i] and G:
                j = rng.randint(G)
                pb[i] = gb[j] + rng.randn(4) * rng.choice([1.0, 5.0, 15.0])
                pc[i] = gc[j] if rng.rand() < 0.85 else rng.randint(1, n_cls + 1)
            else:
                pb[i] = np.concatenate([rng.rand(2) * 80, rng.rand(2) * 20 + 85])
                pc[i] = rng.randint(1, n_cls + 1)
            pb[i, 2:] = np.maximum(pb[i, 2:], pb[i, :2] + 1.0)
        ps = rng.rand(P)
        preds.append({"boxes": pb, "classes": pc, "scores": ps})
        gts.append({"boxes": gb, "classes": gc})
    return preds, gts


def test_coco_map_matches_independent_oracle():
    from depth_estimation_tpu.train.eval_detection import coco_map

    thrs = np.arange(0.5, 1.0, 0.05)
    for seed in range(8):
        rng = np.random.RandomState(seed)
        preds, gts = _random_dataset(rng)
        got = coco_map(preds, gts, thresholds=thrs)
        want_map, want_50 = _oracle_coco_map(preds, gts, thrs)
        assert abs(got["map"] - want_map) <= 1e-3, (seed, got["map"], want_map)
        assert abs(got["map50"] - want_50) <= 1e-3, (seed, got["map50"], want_50)


def test_keypoint_ap_basics():
    from depth_estimation_tpu.train.eval_detection import (compute_keypoint_ap,
                                                           oks_matrix)

    rng = np.random.RandomState(0)
    G, K = 4, 17
    gt = rng.rand(G, K, 2) * 100
    areas = np.full(G, 40.0 * 40.0)
    # perfect predictions -> OKS 1 -> AP 1
    perfect = compute_keypoint_ap(gt.copy(), np.ones(G), gt, areas)
    assert perfect["kp_ap"] == 1.0 and perfect["kp_ap50"] == 1.0
    # oks decreases with distance
    o0 = oks_matrix(gt, gt, areas).diagonal()
    o1 = oks_matrix(gt + 3.0, gt, areas).diagonal()
    o2 = oks_matrix(gt + 12.0, gt, areas).diagonal()
    assert np.all(o0 >= o1 - 1e-12) and np.all(o1 > o2)
    assert np.allclose(o0, 1.0)
    # far predictions -> AP 0
    far = compute_keypoint_ap(gt + 1000.0, np.ones(G), gt, areas)
    assert far["kp_ap"] == 0.0
    # half the predictions good -> AP strictly between
    half = np.concatenate([gt[:2], gt[2:] + 1000.0])
    mid = compute_keypoint_ap(half, np.linspace(1, 0.5, G), gt, areas)
    assert 0.0 < mid["kp_ap"] < 1.0

"""COCO container + COCOeval + NMS + match_by_tag tests."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from mindpose_tpu.utils.coco import COCO, decode_rle, poly_to_mask
from mindpose_tpu.utils.cocoeval import COCOeval
from mindpose_tpu.utils.match import match_by_tag
from mindpose_tpu.utils.nms import oks_iou, oks_nms, soft_oks_nms


def _mini_coco():
    from helpers import make_tiny_coco
    import tempfile

    root = tempfile.mkdtemp()
    _, ann = make_tiny_coco(root, num_images=3, people_per_img=2)
    return COCO(ann)


def test_coco_indexing():
    coco = _mini_coco()
    assert len(coco.getImgIds()) == 3
    assert coco.getCatIds() == [1]
    ann_ids = coco.getAnnIds(imgIds=1)
    assert len(ann_ids) == 2
    anns = coco.loadAnns(ann_ids)
    assert all(a["image_id"] == 1 for a in anns)
    assert coco.getAnnIds(iscrowd=True) == []


def test_rle_uncompressed_round_trip():
    # 3x4 mask, column-major runs
    mask = np.array(
        [[0, 1, 0, 0], [0, 1, 1, 0], [0, 0, 1, 1]], dtype=np.uint8
    )
    # build counts column-major
    flat = mask.T.flatten()
    counts = []
    run_val, run = 0, 0
    for v in flat:
        if v == run_val:
            run += 1
        else:
            counts.append(run)
            run_val, run = v, 1
    counts.append(run)
    rle = {"size": [3, 4], "counts": counts}
    np.testing.assert_array_equal(decode_rle(rle), mask)


def test_poly_to_mask_square():
    mask = poly_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 10, 10)
    assert mask[5, 5] == 1
    assert mask[0, 0] == 0
    assert mask.sum() >= 36  # at least the 6x6 interior


def test_cocoeval_perfect_and_shifted():
    coco = _mini_coco()
    results = [
        {
            "image_id": a["image_id"],
            "category_id": 1,
            "keypoints": list(a["keypoints"]),
            "score": 0.95,
        }
        for a in coco.dataset["annotations"]
    ]
    e = COCOeval(coco, coco.loadRes(results), "keypoints")
    e.evaluate(); e.accumulate(); e.summarize()
    assert e.stats[0] == 1.0
    assert e.stats[5] == 1.0  # AR

    # shift everything far away -> AP 0
    bad = []
    for r in results:
        k = np.array(r["keypoints"], np.float64).reshape(-1, 3)
        k[:, :2] += 500.0
        bad.append({**r, "keypoints": k.flatten().tolist()})
    e2 = COCOeval(coco, coco.loadRes(bad), "keypoints")
    e2.evaluate(); e2.accumulate(); e2.summarize()
    assert e2.stats[0] == 0.0


def test_cocoeval_ranking_matters():
    # a low-scored perfect det + high-scored garbage det: precision drops
    coco = _mini_coco()
    results = []
    for a in coco.dataset["annotations"]:
        results.append({
            "image_id": a["image_id"], "category_id": 1,
            "keypoints": list(a["keypoints"]), "score": 0.5,
        })
        k = np.array(a["keypoints"], np.float64).reshape(-1, 3)
        k[:, :2] += 500.0
        results.append({
            "image_id": a["image_id"], "category_id": 1,
            "keypoints": k.flatten().tolist(), "score": 0.9,
        })
    e = COCOeval(coco, coco.loadRes(results), "keypoints")
    e.evaluate(); e.accumulate(); e.summarize()
    assert 0.0 < e.stats[0] < 1.0


def test_oks_iou_identity():
    g = np.zeros(17 * 3)
    g[0::3] = np.arange(17) * 10
    g[1::3] = np.arange(17) * 5
    g[2::3] = 2
    d = g[None, :].copy()
    ious = oks_iou(g, d, 1000.0, np.array([1000.0]))
    np.testing.assert_allclose(ious, [1.0], atol=1e-6)


def test_oks_nms_suppresses_duplicates():
    kpts = np.zeros(17 * 3)
    kpts[0::3] = np.arange(17) * 4
    kpts[1::3] = np.arange(17) * 4
    kpts[2::3] = 1
    db = [
        {"score": 0.9, "keypoints": kpts.copy(), "area": 100.0},
        {"score": 0.8, "keypoints": kpts.copy(), "area": 100.0},  # dup
        {"score": 0.7, "keypoints": kpts + 300.0, "area": 100.0},  # distinct
    ]
    keep = oks_nms(db, thr=0.9)
    assert list(keep) == [0, 2]
    keep_soft = soft_oks_nms(db, thr=0.9)
    assert 0 in keep_soft


def test_match_by_tag_two_instances():
    k, m, L = 3, 5, 1
    val_k = np.zeros((k, m), np.float32)
    tag_k = np.zeros((k, m, L), np.float32)
    ind_k = np.zeros((k, m, 2), np.float32)
    # instance A: tag 0.0; instance B: tag 5.0; both visible on all joints
    for j in range(k):
        val_k[j, 0] = 0.9
        tag_k[j, 0, 0] = 0.0
        ind_k[j, 0] = [10 + j, 10]
        val_k[j, 1] = 0.8
        tag_k[j, 1, 0] = 5.0
        ind_k[j, 1] = [40 + j, 40]
    ans = match_by_tag(val_k, tag_k, ind_k, joint_order=[0, 1, 2], vis_thr=0.1)
    assert ans.shape == (2, 3, 4)
    # each instance has all 3 joints filled with its own tag
    tags = sorted(ans[:, 0, 3].tolist())
    np.testing.assert_allclose(tags, [0.0, 5.0])
    for inst in ans:
        assert (inst[:, 2] > 0).all()

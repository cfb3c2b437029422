"""COCOeval edge cases: crowd/ignore gts, unlabelled gts, empty detections."""
import numpy as np

from mindpose_tpu.utils.coco import COCO
from mindpose_tpu.utils.cocoeval import COCOeval


def _dataset(extra_anns=None):
    kp = []
    for k in range(17):
        kp.extend([10.0 + 4 * k, 20.0 + 2 * k, 2])
    anns = [
        {
            "id": 1, "image_id": 1, "category_id": 1,
            "bbox": [5.0, 15.0, 80.0, 40.0], "area": 3200.0, "iscrowd": 0,
            "keypoints": kp, "num_keypoints": 17,
        }
    ]
    if extra_anns:
        anns += extra_anns
    return COCO({
        "images": [{"id": 1, "file_name": "a.jpg", "height": 200, "width": 200}],
        "annotations": anns,
        "categories": [{"id": 1, "name": "person"}],
    })


def _det(kp, score=0.9):
    return {"image_id": 1, "category_id": 1, "keypoints": list(kp), "score": score}


def test_crowd_gt_is_ignore():
    kp2 = []
    for k in range(17):
        kp2.extend([100.0 + 4 * k, 120.0 + 2 * k, 2])
    crowd = {
        "id": 2, "image_id": 1, "category_id": 1,
        "bbox": [95.0, 115.0, 80.0, 40.0], "area": 3200.0, "iscrowd": 1,
        "keypoints": kp2, "num_keypoints": 17,
    }
    coco = _dataset([crowd])
    gt_kp = coco.anns[1]["keypoints"]
    # only the non-crowd gt is matched; missing the crowd costs nothing
    e = COCOeval(coco, coco.loadRes([_det(gt_kp)]), "keypoints")
    e.evaluate(); e.accumulate(); e.summarize()
    assert np.isclose(e.stats[0], 1.0)

    # a detection on the crowd region is ignored, not a false positive
    e2 = COCOeval(
        coco, coco.loadRes([_det(gt_kp, 0.9), _det(kp2, 0.8)]), "keypoints"
    )
    e2.evaluate(); e2.accumulate(); e2.summarize()
    assert np.isclose(e2.stats[0], 1.0)


def test_zero_keypoint_gt_is_ignore():
    unlabelled = {
        "id": 3, "image_id": 1, "category_id": 1,
        "bbox": [150.0, 150.0, 30.0, 30.0], "area": 900.0, "iscrowd": 0,
        "keypoints": [0.0] * 51, "num_keypoints": 0,
    }
    coco = _dataset([unlabelled])
    gt_kp = coco.anns[1]["keypoints"]
    e = COCOeval(coco, coco.loadRes([_det(gt_kp)]), "keypoints")
    e.evaluate(); e.accumulate(); e.summarize()
    assert np.isclose(e.stats[0], 1.0)  # missing the unlabelled gt costs nothing


def test_no_detections():
    coco = _dataset()
    e = COCOeval(coco, coco.loadRes([]), "keypoints")
    e.evaluate(); e.accumulate(); e.summarize()
    assert e.stats[0] <= 0.0  # -1 (no data) or 0


def test_duplicate_detections_same_recall_do_not_lower_ap():
    # pycocotools semantics: precision is sampled at the FIRST index reaching
    # each recall threshold, so lower-scored duplicates (same recall) do not
    # reduce AP; only higher-scored false positives do (see
    # test_cocoeval_ranking_matters).
    coco = _dataset()
    gt_kp = coco.anns[1]["keypoints"]
    e1 = COCOeval(coco, coco.loadRes([_det(gt_kp)]), "keypoints")
    e1.evaluate(); e1.accumulate(); e1.summarize()
    dups = [_det(gt_kp, 0.9), _det(gt_kp, 0.8), _det(gt_kp, 0.7)]
    e3 = COCOeval(coco, coco.loadRes(dups), "keypoints")
    e3.evaluate(); e3.accumulate(); e3.summarize()
    assert np.isclose(e3.stats[0], e1.stats[0])

"""TopDownKeypointEvaluator (PCK/AUC/EPE/NME) end-to-end over COCO-style GT."""
import json

import numpy as np
import pytest

from mindpose_tpu.engine.factory import create_evaluator


def _gt_dataset():
    """Two images, two labeled people + one unlabeled (all-v0) annotation."""
    images = [
        {"id": 1, "file_name": "000000000001.jpg", "width": 640, "height": 480},
        {"id": 2, "file_name": "000000000002.jpg", "width": 640, "height": 480},
    ]
    k = 17

    def person(ann_id, img_id, x, y, w, h, labeled=True):
        kp = np.zeros(3 * k)
        kp[0::3] = np.linspace(x + 5, x + w - 5, k)
        kp[1::3] = np.linspace(y + 5, y + h - 5, k)
        kp[2::3] = 2 if labeled else 0
        return {
            "id": ann_id, "image_id": img_id, "category_id": 1,
            "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
            "keypoints": kp.tolist(), "num_keypoints": k if labeled else 0,
        }

    annotations = [
        person(1, 1, 100.0, 100.0, 80.0, 160.0),
        person(2, 1, 400.0, 80.0, 60.0, 120.0),
        person(3, 2, 50.0, 50.0, 100.0, 200.0),
        person(4, 2, 300.0, 40.0, 40.0, 90.0, labeled=False),
    ]
    categories = [{"id": 1, "name": "person", "keypoints": [], "skeleton": []}]
    return {"images": images, "annotations": annotations, "categories": categories}


def _records_from_gt(gt, offset=0.0):
    """One inference record per labeled annotation, optionally shifted."""
    records = []
    id2name = {im["id"]: im["file_name"] for im in gt["images"]}
    for i, ann in enumerate(a for a in gt["annotations"] if a["num_keypoints"]):
        kp = np.asarray(ann["keypoints"], np.float64).reshape(-1, 3)
        pred = np.concatenate(
            [kp[:, :2] + offset, np.full((kp.shape[0], 1), 0.9)], axis=1
        )
        x, y, w, h = ann["bbox"]
        center = np.array([x + w / 2, y + h / 2])
        scale = np.array([w, h]) / 200.0
        box = np.concatenate([center, scale, [w * h], [1.0]])
        records.append(
            dict(pred=pred, box=box,
                 image_path=id2name[ann["image_id"]], bbox_id=i)
        )
    return records


@pytest.fixture(scope="module")
def gt_file(tmp_path_factory):
    gt = _gt_dataset()
    path = tmp_path_factory.mktemp("kpt_eval") / "gt.json"
    path.write_text(json.dumps(gt))
    return str(path), gt


def test_perfect_predictions(gt_file):
    path, gt = gt_file
    ev = create_evaluator(
        path, name="topdown_keypoint", metric=["PCK", "AUC", "EPE", "NME"],
        config={"pck_thr": 0.2},
    )
    out = ev(_records_from_gt(gt))
    assert out["PCK"] == 1.0
    assert out["EPE"] == 0.0
    assert out["NME"] == 0.0
    assert out["AUC"] == 19 / 20  # dist<thr is strict, thr=0 never hits


def test_shifted_predictions_golden(gt_file):
    path, gt = gt_file
    ev = create_evaluator(
        path, name="topdown_keypoint", metric=["PCK", "EPE"],
        config={"pck_thr": 0.2},
    )
    # +30 px x-shift: bbox widths are 80/60/100 -> normalized dx
    # 0.375/0.5/0.3; hypot with dy=0 -> PCK@0.2 = 0 everywhere
    out = ev(_records_from_gt(gt, offset=30.0))
    assert out["PCK"] == 0.0
    np.testing.assert_allclose(out["EPE"], np.hypot(30.0, 30.0))


def test_duplicate_and_unmatched_records(gt_file):
    path, gt = gt_file
    ev = create_evaluator(path, name="topdown_keypoint", metric="PCK",
                          config={})
    records = _records_from_gt(gt)
    # TTA duplicate of record 0 with garbage coords: first record must win
    dup = dict(records[0])
    dup["pred"] = np.asarray(records[0]["pred"]) + 500.0
    out = ev(records + [dup])
    assert out["PCK"] == 1.0


def test_best_metric_sign_for_error_metrics():
    from mindpose_tpu.callbacks.eval_callback import EvalCallback

    cb_max = EvalCallback(target_metric_name="PCK")
    cb_min = EvalCallback(target_metric_name="EPE")
    assert cb_max._metric_sign == 1.0
    assert cb_min._metric_sign == -1.0

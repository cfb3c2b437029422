"""Dataset loading paths: gt annotations, detection results, image folder."""
import json
import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers import make_tiny_coco
from mindpose_tpu.data.dataset import (
    COCOBottomUpDataset,
    COCOTopDownDataset,
    ImageFolderBottomUpDataset,
)

SETTING = {"det_bbox_thr": 0.3}


@pytest.fixture(scope="module")
def tiny():
    root = tempfile.mkdtemp()
    return make_tiny_coco(root, num_images=3, people_per_img=2)


def test_topdown_gt_records(tiny):
    img_root, ann = tiny
    ds = COCOTopDownDataset(img_root, ann, is_train=True, config=SETTING)
    assert len(ds) == 6  # 3 images x 2 people
    rec = ds[0]
    assert rec["keypoints"].shape == (17, 3)
    assert rec["boxes"].shape == (4,)
    assert os.path.isfile(rec["image_file"])


def test_topdown_detection_results(tiny):
    img_root, ann = tiny
    dets = [
        # below threshold -> dropped
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 80], "score": 0.2},
        # wrong category -> dropped
        {"image_id": 1, "category_id": 3, "bbox": [10, 10, 50, 80], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [20, 30, 100, 180], "score": 0.95},
        {"image_id": 2, "category_id": 1, "bbox": [170, 40, 100, 180], "score": 0.8},
    ]
    det_file = os.path.join(os.path.dirname(ann), "dets.json")
    with open(det_file, "w") as f:
        json.dump(dets, f)

    ds = COCOTopDownDataset(
        img_root, ann, is_train=False, use_gt_bbox_for_val=False,
        detection_file=det_file, config=SETTING,
    )
    assert len(ds) == 2
    rec = ds[0]
    assert float(rec["bbox_scores"]) == pytest.approx(0.95)
    assert "keypoints" not in rec  # detections carry no gt joints


def test_bottomup_records(tiny):
    img_root, ann = tiny
    cfg = {"sigma": 2.0, "heatmap_sizes": [[32, 32], [64, 64]], "expand_mask": True}
    ds = COCOBottomUpDataset(img_root, ann, is_train=True, config=cfg)
    assert len(ds) == 3  # per-image records
    rec = ds[0]
    assert rec["keypoints"].shape == (2, 2, 17, 3)  # [levels, M, K, 3]
    assert rec["boxes"].shape == (2, 2, 2)
    assert rec["mask"].shape[0] == 2  # levels
    assert rec["mask"].dtype == np.uint8


def test_imagefolder_dataset(tiny):
    img_root, _ = tiny
    ds = ImageFolderBottomUpDataset(img_root, is_train=False)
    assert len(ds) == 3
    assert os.path.isfile(ds[0]["image_file"])
    with pytest.raises(ValueError):
        ImageFolderBottomUpDataset(img_root, is_train=True)

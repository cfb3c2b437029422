"""CrowdPose support: 14-joint pipeline + crowd-index-stratified AP."""
import json
import os

import cv2
import numpy as np
import pytest

from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.engine.factory import create_evaluator

CROWDPOSE_SETTING = {
    "image_size": [192, 256],
    "heatmap_size": [48, 64],
    "pixel_std": 200.0,
    "scale_padding": 1.25,
    "det_bbox_thr": 0.0,
    "flip_pairs": [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9], [10, 11]],
    "upper_body_ids": [0, 1, 2, 3, 4, 5, 12, 13],
}
SIGMAS = [0.079, 0.079, 0.072, 0.072, 0.062, 0.062, 0.107, 0.107,
          0.087, 0.087, 0.089, 0.089, 0.079, 0.079]
EVAL_SETTING = {
    "has_heatmap_output": True,
    "hflip_tta": False,
    "shift_heatmap": False,
    "vis_thr": 0.2,
    "oks_thr": 0.9,
    "use_nms": True,
    "soft_nms": False,
    "sigmas": SIGMAS,
    "crowd_index_stats": True,
}
K = 14


def make_crowdpose_fixture(root, crowd_indices=(0.05, 0.5, 0.9)):
    """CrowdPose-style json: COCO layout + per-image crowdIndex, 14 joints."""
    rng = np.random.RandomState(0)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for img_id, ci in enumerate(crowd_indices, start=1):
        h, w = 240, 320
        img = rng.randint(0, 60, (h, w, 3), np.uint8)
        for p in range(2):
            x0, y0, bw, bh = 20 + p * 150, 30 + 10 * p, 100, 180
            cv2.rectangle(img, (x0, y0), (x0 + bw, y0 + bh),
                          (200, 160, 120), -1)
            kpts = []
            for k in range(K):
                kx = x0 + 10 + (k % 4) * 25
                ky = y0 + 10 + (k // 4) * 45
                kpts.extend([float(kx), float(ky), 2])
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "bbox": [float(x0), float(y0), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "keypoints": kpts, "num_keypoints": K,
            })
            ann_id += 1
        fname = f"{img_id:06d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fname), img)
        images.append({"id": img_id, "file_name": fname,
                       "height": h, "width": w, "crowdIndex": float(ci)})
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{
            "id": 1, "name": "person", "supercategory": "person",
            "keypoints": [
                "left_shoulder", "right_shoulder", "left_elbow",
                "right_elbow", "left_wrist", "right_wrist", "left_hip",
                "right_hip", "left_knee", "right_knee", "left_ankle",
                "right_ankle", "head", "neck"],
            "skeleton": [],
        }],
    }
    ann_path = os.path.join(root, "crowdpose.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return img_dir, ann_path


@pytest.fixture(scope="module")
def crowdpose(tmp_path_factory):
    return make_crowdpose_fixture(str(tmp_path_factory.mktemp("crowdpose")))


def test_14_joint_pipeline_flow(crowdpose):
    img_root, ann = crowdpose
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=True, config=CROWDPOSE_SETTING)
    transforms = [
        "topdown_box_to_center_scale",
        {"topdown_horizontal_random_flip": {"flip_prob": 1.0}},
        "topdown_affine",
        {"topdown_generate_target": {"sigma": 2.0}},
    ]
    loader = create_pipeline(ds, transforms, method="topdown", batch_size=4,
                             is_train=True, config=CROWDPOSE_SETTING, seed=0)
    batch = next(iter(loader))
    assert batch["image"].shape[1:] == (256, 192, 3)
    assert batch["target"].shape[1:] == (64, 48, K)
    assert batch["target_weight"].shape[1] == K


def test_crowd_index_band_ap(crowdpose):
    img_root, ann = crowdpose
    evaluator = create_evaluator(
        ann, name="topdown", metric=["AP"], config=EVAL_SETTING,
        dataset_config=CROWDPOSE_SETTING, num_joints=K,
        result_path=os.path.join(os.path.dirname(ann), "res.json"))

    # GT keypoints as predictions -> every band that has images scores 1.0
    with open(ann) as f:
        gt = json.load(f)
    by_img = {}
    for a in gt["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)
    records = []
    for img in gt["images"]:
        for slot, a in enumerate(by_img[img["id"]]):
            kp = np.asarray(a["keypoints"], np.float32).reshape(K, 3)
            pred = np.concatenate(
                [kp[:, :2], np.ones((K, 1), np.float32)], axis=1)
            x0, y0, bw, bh = a["bbox"]
            records.append({
                "pred": pred,
                "box": np.array([x0 + bw / 2, y0 + bh / 2, bw / 200.0,
                                 bh / 200.0, bw * bh, 0.99], np.float32),
                "image_path": os.path.join(img_root, img["file_name"]),
                "bbox_id": slot,
            })
    result = evaluator(records)
    assert result["AP"] == pytest.approx(1.0)
    for band in ("easy", "medium", "hard"):
        assert result[f"AP ({band})"] == pytest.approx(1.0), (band, result)


def test_empty_band_reports_minus_one(tmp_path):
    img_root, ann = make_crowdpose_fixture(
        str(tmp_path), crowd_indices=(0.05, 0.5))  # no hard images
    evaluator = create_evaluator(
        ann, name="topdown", metric=["AP"], config=EVAL_SETTING,
        dataset_config=CROWDPOSE_SETTING, num_joints=K,
        result_path=str(tmp_path / "res.json"))
    with open(ann) as f:
        gt = json.load(f)
    img = gt["images"][0]
    a = gt["annotations"][0]
    kp = np.asarray(a["keypoints"], np.float32).reshape(K, 3)
    x0, y0, bw, bh = a["bbox"]
    records = [{
        "pred": np.concatenate(
            [kp[:, :2], np.ones((K, 1), np.float32)], axis=1),
        "box": np.array([x0 + bw / 2, y0 + bh / 2, bw / 200.0, bh / 200.0,
                         bw * bh, 0.99], np.float32),
        "image_path": os.path.join(img_root, img["file_name"]),
        "bbox_id": 0,
    }]
    result = evaluator(records)
    assert result["AP (hard)"] == -1.0
    assert result["AP (easy)"] > -1.0

"""MPII -> COCO converter + PCKh evaluation + 16-joint pipeline flow."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tools"))

from convert_mpii import MPII_NUM_JOINTS, convert  # noqa: E402

from mindpose_tpu.engine.factory import create_evaluator


def _mpii_records(rng, num_images=2, people=2):
    records = []
    for i in range(num_images):
        for _ in range(people):
            center = rng.uniform(150, 400, 2)
            scale = rng.uniform(1.0, 2.5)
            joints = center + rng.uniform(-80, 80, (MPII_NUM_JOINTS, 2))
            vis = (rng.rand(MPII_NUM_JOINTS) > 0.2).astype(float)
            # head joints always labeled so PCKh is defined
            vis[8] = vis[9] = 1.0
            records.append(
                {
                    "image": f"{i:09d}.jpg",
                    "center": center.tolist(),
                    "scale": float(scale),
                    "joints": joints.tolist(),
                    "joints_vis": vis.tolist(),
                }
            )
    return records


def test_convert_structure_and_geometry():
    rng = np.random.RandomState(0)
    records = _mpii_records(rng)
    ds = convert(records, apply_center_shift=True)

    assert len(ds["images"]) == 2
    assert len(ds["annotations"]) == 4
    assert ds["categories"][0]["keypoints"][9] == "head_top"

    for rec, ann in zip(records, ds["annotations"]):
        side = rec["scale"] * 200.0
        x, y, w, h = ann["bbox"]
        assert w == pytest.approx(side) and h == pytest.approx(side)
        # center shifted down by 15 * scale (MPII convention)
        assert x + w / 2 == pytest.approx(rec["center"][0])
        assert y + h / 2 == pytest.approx(
            rec["center"][1] + 15.0 * rec["scale"]
        )
        kp = np.asarray(ann["keypoints"]).reshape(-1, 3)
        vis = np.asarray(rec["joints_vis"])
        np.testing.assert_array_equal(kp[:, 2] > 0, vis > 0)

    # --no-center-shift variant
    ds2 = convert(records, apply_center_shift=False)
    x, y, w, h = ds2["annotations"][0]["bbox"]
    assert y + h / 2 == pytest.approx(records[0]["center"][1])


def test_estimated_image_size_covers_person_boxes():
    """Without --img-root, the estimated canvas must contain every record's
    scale*200 box (incl. the center shift), not just the joints — downstream
    _sanitize_bbox clips boxes to the image, so an undersized estimate would
    silently shift every crop's center/scale off the MPII protocol."""
    rng = np.random.RandomState(3)
    records = _mpii_records(rng, num_images=2, people=3)
    # one extreme record: big scale, tightly clustered joints (the joint
    # extent alone would badly underestimate the canvas)
    records.append({
        "image": records[0]["image"],
        "center": [500.0, 400.0],
        "scale": 3.0,
        "joints": (np.full((MPII_NUM_JOINTS, 2), 500.0)
                   + np.linspace(-20, 20, MPII_NUM_JOINTS)[:, None]).tolist(),
        "joints_vis": [1.0] * MPII_NUM_JOINTS,
    })
    ds = convert(records, apply_center_shift=True)
    size = {im["id"]: (im["width"], im["height"]) for im in ds["images"]}
    for ann in ds["annotations"]:
        x, y, w, h = ann["bbox"]
        width, height = size[ann["image_id"]]
        assert x + w <= width and y + h <= height, ann


def test_pckh_evaluation_golden(tmp_path):
    """PCKh@0.5 with head-segment norm: hand-computed hit fraction."""
    head_len = 40.0
    k = MPII_NUM_JOINTS
    joints = np.zeros((k, 2))
    joints[:, 0] = np.arange(k) * 30.0 + 100.0
    joints[:, 1] = 200.0
    joints[8] = [300.0, 100.0]          # upper_neck
    joints[9] = [300.0, 100.0 - head_len]  # head_top
    records = [
        {
            "image": "000000001.jpg",
            "center": [300.0, 200.0],
            "scale": 2.0,
            "joints": joints.tolist(),
            "joints_vis": [1.0] * k,
        }
    ]
    ds = convert(records, apply_center_shift=False)
    gt_path = tmp_path / "mpii_coco.json"
    gt_path.write_text(json.dumps(ds))

    # PCKh@0.5 radius = 0.5 * 0.6 * head_len = 12 px; offset half the
    # joints by 10 px (hit) and half by 20 px (miss)
    pred = joints.copy()
    pred[: k // 2, 0] += 10.0
    pred[k // 2 :, 0] += 20.0
    rec = dict(
        pred=np.concatenate([pred, np.full((k, 1), 0.9)], axis=1),
        box=np.array([300.0, 200.0, 2.0, 2.0, 400.0 * 400.0, 1.0]),
        image_path="000000001.jpg",
        bbox_id=0,
    )
    ev = create_evaluator(
        str(gt_path), name="topdown_keypoint", metric=["PCK", "EPE"],
        config={"pck_thr": 0.5, "pck_norm_item": "head",
                "head_pair": [9, 8], "head_scale": 0.6},
        dataset_config={},
    )
    out = ev([rec])
    assert out["PCK"] == pytest.approx(0.5)
    assert out["EPE"] == pytest.approx(15.0)

    # head_pair outside num_joints -> clear error
    ev_bad = create_evaluator(
        str(gt_path), name="topdown_keypoint", metric="PCK",
        config={"pck_norm_item": "head", "head_pair": [20, 8]},
        dataset_config={},
    )
    with pytest.raises(ValueError, match="head_pair"):
        ev_bad([rec])


def test_sixteen_joint_pipeline_flow(tmp_path):
    """Converted MPII annotations feed the standard topdown pipeline."""
    import cv2

    from mindpose_tpu.data import create_dataset, create_pipeline

    rng = np.random.RandomState(1)
    records = _mpii_records(rng, num_images=2, people=2)
    img_root = tmp_path / "images"
    img_root.mkdir()
    for rec in records:
        path = img_root / rec["image"]
        if not path.exists():
            cv2.imwrite(
                str(path), rng.randint(0, 255, (480, 640, 3), np.uint8)
            )
    ds_dict = convert(records)
    ann_path = tmp_path / "mpii_coco.json"
    ann_path.write_text(json.dumps(ds_dict))

    setting = {
        "image_size": [64, 64],
        "heatmap_size": [16, 16],
        "pixel_std": 200.0,
        "scale_padding": 1.25,
        "det_bbox_thr": 0.0,
        "flip_pairs": [[0, 5], [1, 4], [2, 3], [10, 15], [11, 14], [12, 13]],
        "upper_body_ids": [7, 8, 9, 10, 11, 12, 13, 14, 15],
    }
    ds = create_dataset(
        str(img_root), str(ann_path), dataset_format="coco_topdown",
        is_train=True, config=setting, num_joints=16,
    )
    loader = create_pipeline(
        ds,
        ["topdown_box_to_center_scale",
         {"topdown_horizontal_random_flip": {"flip_prob": 1.0}},
         "topdown_affine",
         {"topdown_generate_target": {"sigma": 2.0}}],
        method="topdown", batch_size=4, is_train=True, config=setting,
        num_workers=1,
    )
    batch = next(iter(loader))
    assert batch["target"].shape[-1] == 16
    assert batch["target_weight"].shape[1] == 16


def test_flip_index_from_pairs_layouts():
    """Permutation builder: COCO (legacy shape), MPII, trailing unpaired."""
    from mindpose_tpu.data.transform.utils import flip_index_from_pairs

    coco_pairs = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                  [13, 14], [15, 16]]
    legacy = np.insert(np.array(coco_pairs)[:, ::-1].flatten(), 0, 0)
    np.testing.assert_array_equal(flip_index_from_pairs(coco_pairs), legacy)

    mpii_pairs = [[0, 5], [1, 4], [2, 3], [10, 15], [11, 14], [12, 13]]
    idx = flip_index_from_pairs(mpii_pairs)
    assert len(idx) == 16
    expected = np.arange(16)
    for left, right in mpii_pairs:
        expected[left], expected[right] = right, left
    np.testing.assert_array_equal(idx, expected)
    # unpaired joints (pelvis/thorax/neck/head 6-9) map to themselves
    assert all(idx[j] == j for j in (6, 7, 8, 9))

    # trailing unpaired joints need the explicit joint count
    idx = flip_index_from_pairs([[0, 1]], num_joints=4)
    np.testing.assert_array_equal(idx, [1, 0, 2, 3])

    # pair index out of range -> loud error
    with pytest.raises(ValueError, match="out of range"):
        flip_index_from_pairs([[0, 9]], num_joints=4)

    # mismatched cached index is rejected by fliplr_joints
    from mindpose_tpu.data.transform.utils import fliplr_joints

    with pytest.raises(ValueError, match="rebuild"):
        fliplr_joints(np.zeros((16, 3)), 100, flip_index=np.arange(13))

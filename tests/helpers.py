"""Synthetic tiny-COCO fixtures shared by tests and verification drives."""
import json
import os

import cv2
import numpy as np

# COCO person keypoint category skeleton (17 joints)
PERSON_CATEGORY = {
    "id": 1,
    "name": "person",
    "supercategory": "person",
    "keypoints": [
        "nose", "left_eye", "right_eye", "left_ear", "right_ear",
        "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
        "left_wrist", "right_wrist", "left_hip", "right_hip",
        "left_knee", "right_knee", "left_ankle", "right_ankle",
    ],
    "skeleton": [],
}

DATASET_SETTING = {
    "image_size": [192, 256],
    "heatmap_size": [48, 64],
    "pixel_std": 200.0,
    "scale_padding": 1.25,
    "det_bbox_thr": 0.0,
    "flip_pairs": [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]],
    "upper_body_ids": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
}


def make_tiny_coco(
    root: str, num_images: int = 4, people_per_img: int = 2, seed: int = 0,
    frame_hw=(240, 320), box_wh=(100, 180),
):
    """Write a synthetic COCO keypoint dataset (images + annotation json).

    Each person is a bright rectangle with deterministic keypoints inside.
    frame_hw/box_wh control the geometry (default: boxes covering a large
    frame fraction; pass a big frame + small box for realistic-COCO byte
    ratios, e.g. crop-before-ship tests). Returns (image_root, annotation_path).
    """
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, num_images + 1):
        h, w = frame_hw
        img = rng.randint(0, 60, size=(h, w, 3), dtype=np.uint8)
        for p in range(people_per_img):
            bw, bh = box_wh
            x0 = 20 + p * min(150, (w - bw - 25) // max(1, people_per_img - 1)
                              if people_per_img > 1 else 150)
            y0 = 30 + 10 * p
            cv2.rectangle(img, (x0, y0), (x0 + bw, y0 + bh), (200, 160, 120), -1)
            kpts = []
            num_vis = 0
            for k in range(17):
                kx = x0 + 10 + (k % 4) * 25
                ky = y0 + 10 + (k // 4) * 38
                # distinctive per-joint marker so keypoints are visually
                # localizable by a conv net (e2e overfit tests rely on this).
                # colors are identical within each left/right flip pair so
                # horizontal-flip augmentation stays label-consistent (like
                # real humans, left/right are distinguished by side only)
                kc = k if k == 0 else (k - 1) // 2 * 2 + 1
                color = (
                    int(50 + 12 * kc) % 256,
                    int(250 - 13 * kc) % 256,
                    int(40 + 37 * kc) % 256,
                )
                cv2.circle(img, (kx, ky), 6, color, -1)
                kpts.extend([float(kx), float(ky), 2])
                num_vis += 1
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [float(x0), float(y0), float(bw), float(bh)],
                    "area": float(bw * bh),
                    "iscrowd": 0,
                    "keypoints": kpts,
                    "num_keypoints": num_vis,
                    "segmentation": [
                        [x0, y0, x0 + bw, y0, x0 + bw, y0 + bh, x0, y0 + bh]
                    ],
                }
            )
            ann_id += 1
        fname = f"{img_id:012d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fname), img)
        images.append({"id": img_id, "file_name": fname, "height": h, "width": w})

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [PERSON_CATEGORY],
    }
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return img_dir, ann_path


def make_crowded_coco(root: str, num_images: int = 3, people_per_img: int = 6,
                      seed: int = 0):
    """Crowded variant: small persons on a grid (5+ per image) for bottom-up
    grouping tests. Returns (image_root, annotation_path)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, num_images + 1):
        h, w = 240, 320
        img = rng.randint(0, 60, size=(h, w, 3), dtype=np.uint8)
        for p in range(people_per_img):
            x0 = 12 + (p % 3) * 102
            y0 = 18 + (p // 3) * 112
            bw, bh = 82, 92
            cv2.rectangle(img, (x0, y0), (x0 + bw, y0 + bh), (200, 160, 120), -1)
            kpts = []
            for k in range(17):
                kx = x0 + 8 + (k % 4) * 20
                ky = y0 + 8 + (k // 4) * 19
                kc = k if k == 0 else (k - 1) // 2 * 2 + 1
                color = (
                    int(50 + 12 * kc) % 256,
                    int(250 - 13 * kc) % 256,
                    int(40 + 37 * kc) % 256,
                )
                cv2.circle(img, (kx, ky), 4, color, -1)
                kpts.extend([float(kx), float(ky), 2])
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [float(x0), float(y0), float(bw), float(bh)],
                    "area": float(bw * bh),
                    "iscrowd": 0,
                    "keypoints": kpts,
                    "num_keypoints": 17,
                    "segmentation": [
                        [x0, y0, x0 + bw, y0, x0 + bw, y0 + bh, x0, y0 + bh]
                    ],
                }
            )
            ann_id += 1
        fname = f"{img_id:012d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fname), img)
        images.append({"id": img_id, "file_name": fname, "height": h, "width": w})

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [PERSON_CATEGORY],
    }
    ann_path = os.path.join(root, "annotations_crowded.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return img_dir, ann_path


def make_detection_json(ann_path: str, out_path: str, det_score: float = 0.9,
                        jitter: float = 4.0, seed: int = 0,
                        include_junk: bool = True):
    """Synthetic person-detector output for the reference's detector-box eval
    recipe (val_use_gt_bbox=False): jittered GT boxes at ``det_score``, plus —
    when ``include_junk`` — sub-threshold, non-person and false-positive
    entries that the dataset loader must filter or keep appropriately.

    Returns (out_path, num_valid_person_dets).
    """
    rng = np.random.RandomState(seed)
    with open(ann_path) as f:
        gt = json.load(f)

    dets = []
    n_valid = 0
    for a in gt["annotations"]:
        x, y, w, h = a["bbox"]
        dets.append(
            {
                "image_id": a["image_id"],
                "category_id": 1,
                "bbox": [
                    float(x + rng.uniform(-jitter, jitter)),
                    float(y + rng.uniform(-jitter, jitter)),
                    float(w * rng.uniform(0.95, 1.05)),
                    float(h * rng.uniform(0.95, 1.05)),
                ],
                "score": det_score,
            }
        )
        n_valid += 1

    if include_junk:
        img_ids = [im["id"] for im in gt["images"]]
        for img_id in img_ids:
            # sub-threshold person detection (filtered by det_bbox_thr)
            dets.append({"image_id": img_id, "category_id": 1,
                         "bbox": [5.0, 5.0, 30.0, 40.0], "score": 0.01})
            # non-person detection (filtered by category)
            dets.append({"image_id": img_id, "category_id": 2,
                         "bbox": [50.0, 50.0, 60.0, 60.0], "score": 0.95})
            # confident false positive on background (kept; hurts precision,
            # rescoring should suppress it)
            dets.append({"image_id": img_id, "category_id": 1,
                         "bbox": [240.0, 5.0, 60.0, 40.0], "score": det_score})
            n_valid += 1

    with open(out_path, "w") as f:
        json.dump(dets, f)
    return out_path, n_valid

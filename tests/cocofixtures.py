"""Realistic-scale randomized COCO keypoint eval fixtures (pure dicts).

Used by the COCOeval golden/regression tests and the native-vs-numpy parity
tests: hundreds of detections, all three area ranges, crowd and unlabeled
annotations, score ties, false positives and per-image detection counts that
exceed maxDets=20.
"""
from typing import Dict, List, Tuple

import numpy as np

NUM_JOINTS = 17


def _make_instance(rng, img_w, img_h, size_class):
    """One gt person: bbox + keypoints with mixed visibility."""
    side = {
        "small": rng.uniform(12, 30),
        "medium": rng.uniform(40, 90),
        "large": rng.uniform(110, 300),
    }[size_class]
    w = side * rng.uniform(0.6, 1.4)
    h = side * rng.uniform(0.8, 1.8)
    x = rng.uniform(0, max(img_w - w, 1))
    y = rng.uniform(0, max(img_h - h, 1))

    kp = np.zeros(3 * NUM_JOINTS)
    kp[0::3] = rng.uniform(x, x + w, NUM_JOINTS)
    kp[1::3] = rng.uniform(y, y + h, NUM_JOINTS)
    kp[2::3] = rng.choice([0, 1, 2], NUM_JOINTS, p=[0.15, 0.25, 0.6])
    if kp[2::3].max() == 0:
        kp[2] = 2  # keep at least one labeled joint
    return [x, y, w, h], kp


def make_realistic_eval_fixture(
    num_images: int = 40, seed: int = 0
) -> Tuple[Dict, List[Dict]]:
    """Returns (gt_dataset_dict, detection_list) for COCO/COCOeval."""
    rng = np.random.RandomState(seed)
    images, annotations, detections = [], [], []
    ann_id = 1

    for img_id in range(1, num_images + 1):
        img_w, img_h = 640, 480
        images.append(
            {"id": img_id, "file_name": f"{img_id:012d}.jpg",
             "width": img_w, "height": img_h}
        )

        n_people = rng.randint(1, 9)
        for _ in range(n_people):
            size_class = rng.choice(["small", "medium", "large"])
            bbox, kp = _make_instance(rng, img_w, img_h, size_class)
            area = bbox[2] * bbox[3] * rng.uniform(0.5, 0.8)
            iscrowd = int(rng.rand() < 0.08)
            unlabeled = rng.rand() < 0.06
            if unlabeled:
                kp[2::3] = 0
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [float(v) for v in bbox],
                    "area": float(area),
                    "iscrowd": iscrowd,
                    "keypoints": [float(v) for v in kp],
                    "num_keypoints": int((kp[2::3] > 0).sum()),
                }
            )
            ann_id += 1

            # jittered detection for most (non-crowd) gts
            if not iscrowd and rng.rand() < 0.9:
                noise = rng.uniform(0.5, 8.0)
                det = kp.copy()
                det[0::3] += rng.randn(NUM_JOINTS) * noise
                det[1::3] += rng.randn(NUM_JOINTS) * noise
                det[2::3] = rng.uniform(0.2, 1.0, NUM_JOINTS)
                score = float(rng.uniform(0.3, 1.0))
                if rng.rand() < 0.3:
                    score = round(score, 1)  # induce score ties
                detections.append(
                    {
                        "image_id": img_id,
                        "category_id": 1,
                        "keypoints": [float(v) for v in det],
                        "score": score,
                    }
                )

        # false positives; a few images exceed maxDets=20
        n_fp = rng.randint(0, 5) if img_id % 7 else 25
        for _ in range(n_fp):
            bbox, kp = _make_instance(rng, img_w, img_h, rng.choice(
                ["small", "medium", "large"]))
            det = kp.copy()
            det[2::3] = rng.uniform(0.1, 0.9, NUM_JOINTS)
            detections.append(
                {
                    "image_id": img_id,
                    "category_id": 1,
                    "keypoints": [float(v) for v in det],
                    "score": round(float(rng.uniform(0.05, 0.6)), 1),
                }
            )

    gt = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "person", "supercategory": "person"}
        ],
    }
    return gt, detections

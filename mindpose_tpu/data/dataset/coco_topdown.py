"""COCO top-down dataset: keypoint annotations or detection-result boxes.

Parity: /root/reference/mindpose/data/dataset/coco_topdown.py:13-174, using
the in-repo pycocotools-free COCO container.
"""
import json
import os
from typing import Any, Dict, List, Tuple

import numpy as np

from ...register import register
from ...utils.coco import COCO
from .topdown import TopDownDataset


@register("dataset", extra_name="coco_topdown")
class COCOTopDownDataset(TopDownDataset):
    """Per-instance records from COCO keypoint annotations, or from a person
    detection-result JSON filtered by ``det_bbox_thr`` (category 1)."""

    def load_dataset_cfg(self) -> Dict[str, Any]:
        return {"det_bbox_thr": float(self.config.get("det_bbox_thr", 0.0))}

    def load_dataset(self) -> List[Dict[str, Any]]:
        self.coco = COCO(self.annotation_file)
        self.id2name, self.name2id = self._get_mapping_id_name(self.coco.imgs)

        if self.is_train or self.use_gt_bbox_for_val:
            return self._load_coco_keypoint_annotations()
        return self._load_coco_detection_result()

    def _load_coco_keypoint_annotations(self) -> List[Dict[str, Any]]:
        self.img_ids = self.coco.getImgIds()
        gt_db = []
        for img_id in self.img_ids:
            gt_db.extend(self._load_coco_keypoint_annotations_per_img(img_id))
        return gt_db

    def _load_coco_detection_result(self) -> List[Dict[str, Any]]:
        with open(self.detection_file, "r") as f:
            all_boxes = json.load(f)

        bbox_id = 0
        kpt_db = []
        for det_res in all_boxes:
            if det_res["category_id"] != 1:
                continue
            image_file = os.path.join(
                self.image_root, self.id2name[det_res["image_id"]]
            )
            score = det_res["score"]
            if score < self._dataset_cfg["det_bbox_thr"]:
                continue
            kpt_db.append(
                {
                    "image_file": image_file,
                    "rotation": 0,
                    "boxes": det_res["bbox"],
                    "bbox_ids": bbox_id,
                    "bbox_scores": score,
                }
            )
            bbox_id += 1
        return kpt_db

    def _load_coco_keypoint_annotations_per_img(
        self, img_id: int
    ) -> List[Dict[str, Any]]:
        img_ann = self.coco.loadImgs(img_id)[0]
        img_width = img_ann["width"]
        img_height = img_ann["height"]

        ann_ids = self.coco.getAnnIds(imgIds=img_id, iscrowd=False)
        annos = self.coco.loadAnns(ann_ids)
        annos = self._sanitize_bbox(annos, img_width, img_height)

        bbox_id = 0
        rec = []
        for anno in annos:
            if "keypoints" not in anno:
                continue
            if max(anno["keypoints"]) == 0:
                continue
            if "num_keypoints" in anno and anno["num_keypoints"] == 0:
                continue

            keypoints = np.array(anno["keypoints"]).reshape(-1, 3)
            keypoints[:, 2] = np.minimum(1, keypoints[:, 2])

            rec.append(
                {
                    "image_file": os.path.join(self.image_root, self.id2name[img_id]),
                    "keypoints": keypoints,
                    "rotation": 0,
                    "boxes": anno["bbox"],
                    "bbox_ids": bbox_id,
                    "bbox_scores": 1.0,
                }
            )
            bbox_id += 1
        return rec

    @staticmethod
    def _get_mapping_id_name(
        imgs: Dict[int, Dict],
    ) -> Tuple[Dict[int, str], Dict[str, int]]:
        id2name = {}
        name2id = {}
        for image_id, image in imgs.items():
            id2name[image_id] = image["file_name"]
            name2id[image["file_name"]] = image_id
        return id2name, name2id

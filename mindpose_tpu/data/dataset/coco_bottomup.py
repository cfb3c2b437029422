"""COCO bottom-up dataset: per-image keypoints + crowd/zero-kpt masks.

Parity: /root/reference/mindpose/data/dataset/coco_bottomup.py:15-189, using
the in-repo COCO container and RLE/polygon rasterization (cv2) instead of
pycocotools.mask.
"""
import os
from typing import Any, Dict, List, Tuple

import cv2
import numpy as np

from ...register import register
from ...utils.coco import COCO, annotation_to_mask, image_id_name_maps
from .bottomup import BottomUpDataset


@register("dataset", extra_name="coco_bottomup")
class COCOBottomUpDataset(BottomUpDataset):
    def load_dataset_cfg(self) -> Dict[str, Any]:
        return {
            "sigma": float(self.config["sigma"]),
            "heatmap_sizes": self.config["heatmap_sizes"],
            "expand_mask": self.config["expand_mask"],
        }

    def load_dataset(self) -> List[Dict[str, Any]]:
        self.coco = COCO(self.annotation_file)
        self.id2name, self.name2id = image_id_name_maps(self.coco.imgs)
        return self._load_coco_keypoint_annotations()

    def _load_coco_keypoint_annotations(self) -> List[Dict[str, Any]]:
        self.img_ids = self.coco.getImgIds()
        gt_db = []
        for img_id in self.img_ids:
            if self.is_train:
                # skip images without annotations
                if len(self.coco.getAnnIds(imgIds=img_id)) == 0:
                    continue
            gt_db.append(self._load_coco_keypoint_annotations_per_img(img_id))
        return gt_db

    def _load_coco_keypoint_annotations_per_img(self, img_id: int) -> Dict[str, Any]:
        ann_ids = self.coco.getAnnIds(imgIds=img_id)
        annos = self.coco.loadAnns(ann_ids)

        mask_info = self._get_encoded_mask(annos, img_id)
        annos = [
            obj for obj in annos if obj.get("iscrowd", 0) == 0 or obj["num_keypoints"] > 0
        ]
        return {
            "image_file": os.path.join(self.image_root, self.id2name[img_id]),
            "keypoints": self._get_keypoints(annos),
            "boxes": self._get_boxes(annos),
            "mask_info": mask_info,
        }

    def _get_keypoints(self, annos: List[Dict[str, Any]]) -> np.ndarray:
        """[levels, M, K, 3] keypoints (tiled per heatmap level)."""
        if len(annos) == 0:
            keypoints = np.zeros((1, self.num_joints, 3))
        else:
            keypoints = np.stack(
                [np.array(x["keypoints"]).reshape((-1, 3)) for x in annos], axis=0
            )
        num_levels = len(self._dataset_cfg["heatmap_sizes"])
        return np.tile(keypoints[None, ...], (num_levels, 1, 1, 1))

    def _get_boxes(self, annos: List[Dict[str, Any]]) -> np.ndarray:
        """[M, 2, 2] xyxy boxes."""
        if len(annos) == 0:
            return np.zeros((1, 2, 2))
        boxes = np.stack([np.array(x["bbox"]) for x in annos], axis=0)
        boxes[..., 2] += boxes[..., 0]
        boxes[..., 3] += boxes[..., 1]
        return boxes.reshape((-1, 2, 2))

    def _get_encoded_mask(
        self, annos: List[Dict[str, Any]], idx: int
    ) -> Dict[str, Any]:
        """Bit-packed validity mask excluding crowd / zero-keypoint regions,
        optionally eroded by a 3-sigma circle per level (ref :146-189)."""
        img_info = self.coco.loadImgs(idx)[0]
        height, width = img_info["height"], img_info["width"]

        m = np.zeros((height, width), dtype=np.float32)
        for obj in annos:
            if "segmentation" in obj and obj["segmentation"]:
                if obj.get("iscrowd", 0):
                    m += annotation_to_mask(obj["segmentation"], height, width)
                elif obj["num_keypoints"] == 0:
                    m += annotation_to_mask(obj["segmentation"], height, width)

        m = m < 0.5

        num_levels = len(self._dataset_cfg["heatmap_sizes"])
        m = np.tile(m[None, ...], (num_levels, 1, 1))

        if self._dataset_cfg["expand_mask"]:
            sigma = self._dataset_cfg["sigma"]
            for i in range(num_levels):
                size = int(3 * sigma * (2 ** (num_levels - i)))
                kernel = np.zeros((2 * size + 1, 2 * size + 1), dtype=np.uint8)
                cv2.circle(kernel, (size, size), size, 1, -1)
                m[i] = cv2.erode(m[i].astype(np.uint8), kernel).astype(bool)

        encoded = np.packbits(m)
        return {"encoded_mask": encoded, "count": m.size, "shape": m.shape}

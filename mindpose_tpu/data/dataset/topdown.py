"""Top-down dataset base: per-bbox record iterator.

Parity: /root/reference/mindpose/data/dataset/topdown.py:8-141. Records are
plain dicts (the MindSpore column-tuple protocol is replaced by dict states
flowing through the transform pipeline); images are decoded lazily in the
loader workers.
"""
import logging
from copy import deepcopy
from typing import Any, Dict, List, Optional

import numpy as np


class TopDownDataset:
    """Indexable dataset of per-instance records.

    Record keys: image_file, boxes (xywh), keypoints [K, 3] (train/gt),
    rotation, bbox_ids, bbox_scores.
    """

    def __init__(
        self,
        image_root: str,
        annotation_file: Optional[str] = None,
        is_train: bool = False,
        num_joints: int = 17,
        use_gt_bbox_for_val: bool = False,
        detection_file: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.image_root = image_root
        self.annotation_file = annotation_file
        self.is_train = is_train
        self.num_joints = num_joints
        self.use_gt_bbox_for_val = use_gt_bbox_for_val
        self.detection_file = detection_file
        self.config = config if config else dict()

        if self.annotation_file is None:
            if not self.is_train and not self.use_gt_bbox_for_val:
                raise ValueError(
                    "For evaluation, `detection_file` must be provided "
                    "when `use_gt_bbox_for_val` is `False`"
                )

        self._dataset_cfg = self.load_dataset_cfg()
        self._dataset = self.load_dataset()
        logging.info("Number of records in dataset: %d", len(self._dataset))

    def load_dataset_cfg(self) -> Dict[str, Any]:
        raise NotImplementedError("Child class must implement this method.")

    def load_dataset(self) -> List[Dict[str, Any]]:
        raise NotImplementedError("Child class must implement this method.")

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        record = self._dataset[idx]
        state: Dict[str, Any] = {
            "image_file": record["image_file"],
            "boxes": np.asarray(record["boxes"], dtype=np.float32),
            "rotation": np.float32(record.get("rotation", 0.0)),
            "bbox_ids": np.int32(record.get("bbox_ids", 0)),
            "bbox_scores": np.float32(record.get("bbox_scores", 1.0)),
        }
        if "keypoints" in record:
            state["keypoints"] = np.asarray(record["keypoints"], dtype=np.float32)
        return state

    @staticmethod
    def _sanitize_bbox(
        annos: List[Dict], img_width: int, img_height: int
    ) -> List[Dict[str, Any]]:
        """Clip boxes into the image; drop degenerate/empty ones."""
        valid_annos = []
        for anno in annos:
            if "bbox" not in anno:
                continue
            x, y, w, h = anno["bbox"]
            x1 = max(0, x)
            y1 = max(0, y)
            x2 = min(img_width - 1, x1 + max(0, w - 1))
            y2 = min(img_height - 1, y1 + max(0, h - 1))
            if ("area" not in anno or anno["area"] > 0) and x2 > x1 and y2 > y1:
                valid = deepcopy(anno)
                valid["bbox"] = [x1, y1, x2 - x1, y2 - y1]
                valid_annos.append(valid)
        return valid_annos

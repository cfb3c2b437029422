"""Bottom-up dataset base: per-image record iterator.

Parity: /root/reference/mindpose/data/dataset/bottomup.py:7-102. Masks are
kept packed as bits in the record store and decoded in ``__getitem__``.
"""
import logging
from typing import Any, Dict, List, Optional

import numpy as np


class BottomUpDataset:
    """Indexable dataset of per-image records.

    Train record keys: image_file, boxes [M, 2, 2] (xyxy), keypoints
    [levels, M, K, 3], mask [levels, H, W] (decoded). Val record keys:
    image_file only (the rest comes from the transforms).
    """

    def __init__(
        self,
        image_root: str,
        annotation_file: Optional[str] = None,
        is_train: bool = False,
        num_joints: int = 17,
        config: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.image_root = image_root
        self.annotation_file = annotation_file
        self.is_train = is_train
        self.num_joints = num_joints
        self.config = config if config else dict()
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
        state: Dict[str, Any] = {"image_file": record["image_file"]}
        if self.is_train:
            mask_info = record["mask_info"]
            mask = np.unpackbits(
                mask_info["encoded_mask"], count=mask_info["count"]
            ).reshape(mask_info["shape"])
            state["boxes"] = np.asarray(record["boxes"], dtype=np.float32)
            state["keypoints"] = np.asarray(record["keypoints"], dtype=np.float32)
            state["mask"] = np.asarray(mask, dtype=np.uint8)
        return state

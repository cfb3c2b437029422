"""Top-down evaluator: dedup by bbox_id, rescoring, OKS-NMS, COCO AP.

Parity: /root/reference/mindpose/engine/evaluator/topdown_evaluator.py:12-148.
"""
import os
from collections import defaultdict
from typing import Any, Dict, List, Optional, Union

import numpy as np

from ...register import register
from ...utils.nms import oks_nms, soft_oks_nms
from .evaluator import Evaluator


@register("evaluator", extra_name="topdown")
class TopDownEvaluator(Evaluator):
    SUPPORT_METRICS = {"AP"}

    def __init__(
        self,
        annotation_file: str,
        metric: Union[str, List[str]] = "AP",
        num_joints: int = 17,
        config: Optional[Dict[str, Any]] = None,
        remove_result_file: bool = True,
        result_path: str = "./result_keypoints.json",
    ) -> None:
        super().__init__(
            annotation_file, metric=metric, num_joints=num_joints, config=config
        )
        self.remove_result_file = remove_result_file
        self.result_path = result_path

    def load_evaluation_cfg(self) -> Dict[str, Any]:
        return {
            "vis_thr": self.config["vis_thr"],
            "oks_thr": self.config["oks_thr"],
            "use_nms": self.config["use_nms"],
            "soft_nms": self.config["soft_nms"],
            "sigmas": np.array(self.config["sigmas"]),
        }

    def eval(self, inference_result: List[Dict[str, Any]]) -> Dict[str, Any]:
        kpts = defaultdict(list)
        for record in inference_result:
            image_id = self.name2id[os.path.basename(record["image_path"])]
            kpts[image_id].append(
                {
                    "keypoints": record["pred"],
                    "center": record["box"][0:2],
                    "scale": record["box"][2:4],
                    "area": record["box"][4],
                    "score": record["box"][5],
                    "image_id": image_id,
                    "bbox_id": record["bbox_id"],
                }
            )
        kpts = self._sort_and_unique_bboxes(kpts)

        # keypoint-score rescoring + OKS NMS (ref :94-120)
        vis_thr = self._evaluation_cfg["vis_thr"]
        oks_thr = self._evaluation_cfg["oks_thr"]
        valid_kpts = []
        for image_id in kpts.keys():
            img_kpts = kpts[image_id]
            for n_p in img_kpts:
                box_score = n_p["score"]
                kpt_score = 0.0
                valid_num = 0
                for n_jt in range(self.num_joints):
                    t_s = n_p["keypoints"][n_jt][2]
                    if t_s > vis_thr:
                        kpt_score += t_s
                        valid_num += 1
                if valid_num != 0:
                    kpt_score = kpt_score / valid_num
                n_p["score"] = kpt_score * box_score

            if self._evaluation_cfg["use_nms"]:
                nms = soft_oks_nms if self._evaluation_cfg["soft_nms"] else oks_nms
                keep = nms(
                    img_kpts, oks_thr, sigmas=self._evaluation_cfg["sigmas"]
                )
                valid_kpts.append([img_kpts[_keep] for _keep in keep])
            else:
                valid_kpts.append(img_kpts)

        self._write_coco_keypoint_results(valid_kpts, self.result_path)
        name_value = dict(self._do_python_keypoint_eval(self.result_path))

        for name in self.metrics:
            if name not in name_value:
                raise ValueError(
                    f"`{name}` is not in the returned result `{name_value.keys()}`"
                )
        if self.remove_result_file:
            os.remove(self.result_path)
        return name_value

    @staticmethod
    def _sort_and_unique_bboxes(kpts, key: str = "bbox_id"):
        for img_id, persons in kpts.items():
            num = len(persons)
            kpts[img_id] = sorted(kpts[img_id], key=lambda x: x[key])
            for i in range(num - 1, 0, -1):
                if kpts[img_id][i][key] == kpts[img_id][i - 1][key]:
                    del kpts[img_id][i]
        return kpts

"""Visualize ground-truth heatmaps/masks from the training pipeline.

Parity: /root/reference/tools/visual/visual_gt_heatmap.py — renders, for N
samples, the augmented image with the summed target heatmap (and mask/tag
positions for bottom-up) overlaid.

Usage:
    python tools/visual/visual_gt_heatmap.py --config <cfg.yaml> \
        [--num-samples 4] [--output-dir ./vis_gt]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from mindpose_tpu.config import parse_args
from mindpose_tpu.data import create_dataset, create_pipeline
from common.log import setup_default_logging


def _overlay_heatmap(image_norm: np.ndarray, heatmap: np.ndarray,
                     mean, std) -> np.ndarray:
    """image_norm: normalized HWC; heatmap: [H', W'] in [0, 1]."""
    img = (image_norm * (np.array(std) * 255.0) + np.array(mean) * 255.0)
    img = np.clip(img, 0, 255).astype(np.uint8)
    hm = cv2.resize(heatmap, (img.shape[1], img.shape[0]))
    hm = np.clip(hm * 255.0, 0, 255).astype(np.uint8)
    hm_color = cv2.applyColorMap(hm, cv2.COLORMAP_JET)
    return cv2.addWeighted(cv2.cvtColor(img, cv2.COLOR_RGB2BGR), 0.6, hm_color, 0.4, 0)


def main() -> None:
    setup_default_logging()
    args = parse_args(
        description="visualize gt heatmaps",
        extra_args=[
            {"names": ["--num-samples"], "type": int, "default": 4},
            {"names": ["--output-dir"], "type": str, "default": "./vis_gt"},
        ],
    )
    os.makedirs(args.output_dir, exist_ok=True)

    dataset = create_dataset(
        args.train_root, args.train_label, dataset_format=args.dataset_format,
        is_train=True, config=args.dataset_setting,
    )
    loader = create_pipeline(
        dataset, transforms=args.train_transforms, method=args.pipeline_method,
        batch_size=1, is_train=True, normalize_mean=args.normalize_mean,
        normalize_std=args.normalize_std, config=args.dataset_setting,
    )

    it = iter(loader)
    for i in range(args.num_samples):
        batch = next(it)
        image = batch["image"][0]
        target = batch["target"][0]
        if args.pipeline_method == "topdown":
            hm = target.max(axis=-1)  # [H', W', K] -> [H', W']
            vis = _overlay_heatmap(image, hm, args.normalize_mean, args.normalize_std)
            out = os.path.join(args.output_dir, f"gt_{i}.jpg")
            cv2.imwrite(out, vis)
        else:
            # bottom-up: one panel per level plus the mask
            panels = []
            for lvl in range(target.shape[0]):
                hm = target[lvl].max(axis=-1)
                panels.append(
                    _overlay_heatmap(image, hm, args.normalize_mean, args.normalize_std)
                )
            mask = batch["mask"][0]
            mask_vis = (mask[0][..., None] * np.array([0, 255, 0])).astype(np.uint8)
            mask_vis = cv2.resize(mask_vis, (panels[0].shape[1], panels[0].shape[0]))
            panels.append(mask_vis)
            out = os.path.join(args.output_dir, f"gt_{i}.jpg")
            cv2.imwrite(out, np.concatenate(panels, axis=1))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()

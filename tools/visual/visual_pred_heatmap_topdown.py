"""Visualize top-down predicted heatmaps and keypoints for a checkpoint.

Parity: /root/reference/tools/visual/visual_pred_heatmap_topdown.py.

Usage:
    python tools/visual/visual_pred_heatmap_topdown.py --config <cfg.yaml> \
        --ckpt <ckpt> [--num-samples 4] [--output-dir ./vis_pred]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from mindpose_tpu.config import parse_args
from mindpose_tpu.utils.checkpoint import load_variables
from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.models import create_decoder, create_eval_network, create_network
from common.log import setup_default_logging


def main() -> None:
    setup_default_logging()
    args = parse_args(
        description="visualize top-down predictions",
        extra_args=[
            {"names": ["--num-samples"], "type": int, "default": 4},
            {"names": ["--output-dir"], "type": str, "default": "./vis_pred"},
        ],
    )
    os.makedirs(args.output_dir, exist_ok=True)

    dataset = create_dataset(
        args.val_root, args.val_label, dataset_format=args.dataset_format,
        is_train=False, use_gt_bbox_for_val=True, config=args.dataset_setting,
    )
    loader = create_pipeline(
        dataset, transforms=args.val_transforms, method=args.pipeline_method,
        batch_size=1, is_train=False, normalize_mean=args.normalize_mean,
        normalize_std=args.normalize_std, config=args.dataset_setting,
    )

    net = create_network(
        backbone_name=args.backbone_name, head_name=args.head_name,
        num_joints=args.num_joints,
        backbone_args=getattr(args, "backbone_setting", None),
        head_args=getattr(args, "head_setting", None),
    )
    image_size = args.dataset_setting["image_size"]
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, image_size[1], image_size[0], 3)),
        train=False,
    )
    if getattr(args, "ckpt", None):
        variables = load_variables(args.ckpt, variables)

    decoder = create_decoder(
        args.decoder_name, to_original=False,
        **{k: v for k, v in (getattr(args, "decoder_setting", None) or {}).items()
           if k != "to_original"},
    )
    eval_net = create_eval_network(net, decoder, output_raw=True)
    forward = jax.jit(eval_net.apply)

    mean = np.array(args.normalize_mean) * 255.0
    std = np.array(args.normalize_std) * 255.0

    it = iter(loader)
    for i in range(args.num_samples):
        batch = next(it)
        (preds, _), heatmap = forward(
            variables, jnp.asarray(batch["image"]),
            jnp.asarray(batch["center"].astype(np.float32)),
            jnp.asarray(batch["scale"].astype(np.float32)),
            jnp.asarray(batch["bbox_scores"].astype(np.float32)),
        )
        img = np.clip(batch["image"][0] * std + mean, 0, 255).astype(np.uint8)
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        hm = np.asarray(heatmap)[0].max(axis=-1)
        hm = cv2.resize(np.clip(hm * 255, 0, 255).astype(np.uint8),
                        (img.shape[1], img.shape[0]))
        vis = cv2.addWeighted(img, 0.6, cv2.applyColorMap(hm, cv2.COLORMAP_JET), 0.4, 0)

        # draw decoded keypoints (heatmap frame -> image frame scale)
        scale_x = img.shape[1] / np.asarray(heatmap).shape[2]
        scale_y = img.shape[0] / np.asarray(heatmap).shape[1]
        for x, y, s in np.asarray(preds)[0]:
            if s > 0.2:
                cv2.circle(vis, (int(x * scale_x), int(y * scale_y)), 3,
                           (255, 255, 255), -1)
        out = os.path.join(args.output_dir, f"pred_{i}.jpg")
        cv2.imwrite(out, vis)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()

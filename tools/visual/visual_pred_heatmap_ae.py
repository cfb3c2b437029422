"""Visualize bottom-up AE predictions: heatmaps, tag map, grouped skeletons.

Parity: /root/reference/tools/visual/visual_pred_heatmap_ae.py.

Usage:
    python tools/visual/visual_pred_heatmap_ae.py --config <cfg.yaml> \
        --ckpt <ckpt> [--num-samples 2] [--output-dir ./vis_ae]
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
from mindpose_tpu.engine import create_inferencer
from mindpose_tpu.models import create_decoder, create_eval_network, create_network
from common.log import setup_default_logging

_COLORS = [
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0), (255, 0, 255),
    (0, 255, 255), (128, 255, 0), (255, 128, 0), (0, 128, 255), (128, 0, 255),
]


def main() -> None:
    setup_default_logging()
    args = parse_args(
        description="visualize bottom-up AE predictions",
        extra_args=[
            {"names": ["--num-samples"], "type": int, "default": 2},
            {"names": ["--output-dir"], "type": str, "default": "./vis_ae"},
        ],
    )
    os.makedirs(args.output_dir, exist_ok=True)

    dataset = create_dataset(
        args.val_root, args.val_label, dataset_format=args.dataset_format,
        is_train=False, config=args.dataset_setting,
    )
    loader = create_pipeline(
        dataset, transforms=args.val_transforms, method="bottomup",
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
        args.decoder_name, **(getattr(args, "decoder_setting", None) or {})
    )
    eval_net = create_eval_network(net, decoder, output_raw=True)
    inferencer = create_inferencer(
        eval_net, name=args.inference_method, config=args.eval_setting,
        dataset_config=args.dataset_setting,
    )

    mean = np.array(args.normalize_mean) * 255.0
    std = np.array(args.normalize_std) * 255.0

    it = iter(loader)
    for i in range(args.num_samples):
        batch = next(it)
        # device decode + host grouping through the real inference path
        outputs = inferencer(
            [batch], variables=variables
        )
        record = outputs[0]

        img = np.clip(batch["image"][0] * std + mean, 0, 255).astype(np.uint8)
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)

        # draw grouped instances in the padded-image frame
        vis = img.copy()
        ds = args.eval_setting["downsample_scale"]
        center = batch["center"][0]
        scale = np.asarray(batch["scale"][0], np.float64) * args.dataset_setting["pixel_std"]
        shape = np.asarray(batch["image_shape"][0], np.float64)
        for j, (kpt, score) in enumerate(zip(record["pred"], record["score"])):
            if score <= 0:
                continue
            color = _COLORS[j % len(_COLORS)]
            # map original-frame coords back into the padded canvas
            for x, y, s, *rest in np.asarray(kpt):
                if s > args.eval_setting["vis_thr"]:
                    cx = (x - center[0] + scale[0] * 0.5) * shape[0] / scale[0]
                    cy = (y - center[1] + scale[1] * 0.5) * shape[1] / scale[1]
                    cv2.circle(vis, (int(cx), int(cy)), 3, color, -1)
        out = os.path.join(args.output_dir, f"ae_{i}.jpg")
        cv2.imwrite(out, vis)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()

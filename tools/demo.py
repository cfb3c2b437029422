"""Demo CLI: run pose prediction on images and draw skeletons.

Usage:
    python tools/demo.py --config <cfg.yaml> --ckpt <ckpt> \
        --image-dir <dir> [--boxes x,y,w,h ...] [--output-dir ./demo_out]

Top-down configs: without --boxes, the whole image is used as a single
person box. Bottom-up configs (pipeline_method: bottomup) need no boxes —
the BottomUpPredictor finds every person directly.
"""
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from mindpose_tpu.config import parse_args
from mindpose_tpu.engine import BottomUpPredictor, TopDownPredictor
from mindpose_tpu.models import create_network
from common.log import setup_default_logging

# default skeleton is the 17-joint COCO layout; other layouts (MPII 16,
# CrowdPose 14) supply dataset_setting.skeleton in their recipe, else only
# joint dots are drawn
_COCO_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]


def _resolve_skeleton(args):
    edges = (args.dataset_setting or {}).get("skeleton")
    if edges is None and args.num_joints == 17:
        edges = _COCO_SKELETON
    return [
        (int(a), int(b)) for a, b in (edges or [])
        if max(int(a), int(b)) < args.num_joints
    ]


def main() -> None:
    setup_default_logging()
    args = parse_args(
        description="pose demo",
        extra_args=[
            {"names": ["--image-dir"], "type": str, "required": True},
            {"names": ["--boxes"], "type": str, "nargs": "*", "default": None},
            {"names": ["--output-dir"], "type": str, "default": "./demo_out"},
            {"names": ["--vis-thr"], "type": float, "default": 0.2},
        ],
    )
    skeleton = _resolve_skeleton(args)
    os.makedirs(args.output_dir, exist_ok=True)

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
        with open(args.ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        variables = {
            "params": raw.get("params", raw),
            "batch_stats": raw.get("batch_stats", variables.get("batch_stats", {})),
        }

    bottomup = getattr(args, "pipeline_method", "topdown") == "bottomup"
    if bottomup:
        predictor = BottomUpPredictor(
            net, variables,
            dataset_setting=args.dataset_setting,
            eval_setting=args.eval_setting,
            decoder_setting=getattr(args, "decoder_setting", None),
            normalize_mean=args.normalize_mean,
            normalize_std=args.normalize_std,
        )
    else:
        predictor = TopDownPredictor(
            net, variables,
            dataset_setting=args.dataset_setting,
            decoder_setting=getattr(args, "decoder_setting", None),
            normalize_mean=args.normalize_mean,
            normalize_std=args.normalize_std,
            decoder_name=getattr(args, "decoder_name", "topdown_heatmap")
            or "topdown_heatmap",
        )

    for path in sorted(glob.glob(os.path.join(args.image_dir, "*"))):
        if os.path.splitext(path)[1].lower() not in (".jpg", ".jpeg", ".png"):
            continue
        bgr = cv2.imread(path)
        img = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if bottomup:
            preds, _scores = predictor(img)
        else:
            if args.boxes:
                boxes = np.array(
                    [[float(v) for v in b.split(",")] for b in args.boxes]
                )
            else:
                boxes = np.array(
                    [[0, 0, img.shape[1], img.shape[0]]], np.float32
                )
            preds = predictor(img, boxes)

        for person in preds:
            for a, b in skeleton:
                if person[a, 2] > args.vis_thr and person[b, 2] > args.vis_thr:
                    cv2.line(
                        bgr,
                        (int(person[a, 0]), int(person[a, 1])),
                        (int(person[b, 0]), int(person[b, 1])),
                        (0, 255, 0), 2,
                    )
            # bottom-up preds carry extra tag columns beyond (x, y, score)
            for x, y, s in person[:, :3]:
                if s > args.vis_thr:
                    cv2.circle(bgr, (int(x), int(y)), 3, (0, 0, 255), -1)
        out = os.path.join(args.output_dir, os.path.basename(path))
        cv2.imwrite(out, bgr)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()

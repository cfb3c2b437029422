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
from mindpose_tpu.config import parse_args
from mindpose_tpu.engine import BottomUpPredictor, TopDownPredictor
from mindpose_tpu.models import create_network
from mindpose_tpu.utils.checkpoint import load_variables
from common.log import setup_default_logging
from common.skeleton import resolve_skeleton

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
    skeleton = resolve_skeleton(args)
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
        variables = load_variables(args.ckpt, variables)

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

"""Video pose demo: per-frame prediction + One-Euro temporal smoothing.

Usage:
    python tools/demo_video.py --config <cfg.yaml> --ckpt <ckpt> \
        --video in.mp4 [--output out.mp4] [--boxes x,y,w,h ...] \
        [--no-smooth] [--max-frames N]

Top-down configs: --boxes fixes the person crops for every frame (default:
one whole-frame box). Bottom-up configs (pipeline_method: bottomup) detect
every person per frame; instances are matched to the previous frame by
center distance (Hungarian) so smoothing follows the same person, and the
filter resets when the instance count changes. No reference counterpart.
"""
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from common.log import setup_default_logging
from common.skeleton import resolve_skeleton
from mindpose_tpu.config import parse_args
from mindpose_tpu.engine import BottomUpPredictor, TopDownPredictor
from mindpose_tpu.models import create_network
from mindpose_tpu.utils.checkpoint import load_variables
from mindpose_tpu.utils.smoothing import OneEuroFilter


def _associate(people, prev_centers):
    """Reorder instances to match the previous frame's person centers.

    The One-Euro state is keyed by array position, but bottom-up grouping
    order is not a stable identity — two people whose scores cross would
    otherwise have their trajectories low-passed into each other. Hungarian
    assignment on center distance makes position a stable identity while
    the instance count is unchanged (a count change resets the filter).
    """
    if prev_centers is None or len(prev_centers) != len(people) \
            or len(people) < 2:
        return people
    from scipy.optimize import linear_sum_assignment

    centers = people[:, :, :2].mean(axis=1)
    cost = np.linalg.norm(centers[:, None] - prev_centers[None], axis=-1)
    rows, cols = linear_sum_assignment(cost)
    order = np.empty(len(people), int)
    order[cols] = rows
    return people[order]


def _draw(frame, people, vis_thr, skeleton):
    for person in people:
        for a, b in skeleton:
            if (
                max(a, b) < len(person)
                and person[a, 2] > vis_thr
                and person[b, 2] > vis_thr
            ):
                cv2.line(frame, (int(person[a, 0]), int(person[a, 1])),
                         (int(person[b, 0]), int(person[b, 1])),
                         (0, 255, 0), 2)
        for x, y, s in person[:, :3]:
            if s > vis_thr:
                cv2.circle(frame, (int(x), int(y)), 3, (0, 0, 255), -1)


def main() -> None:
    setup_default_logging()
    args = parse_args(
        description="video pose demo",
        extra_args=[
            {"names": ["--video"], "type": str, "required": True},
            {"names": ["--output"], "type": str, "default": "./demo_video_out.mp4"},
            {"names": ["--boxes"], "type": str, "nargs": "*", "default": None},
            {"names": ["--vis-thr"], "type": float, "default": 0.2},
            {"names": ["--no-smooth"], "action": "store_true"},
            {"names": ["--min-cutoff"], "type": float, "default": 1.0},
            {"names": ["--beta"], "type": float, "default": 0.007},
            {"names": ["--max-frames"], "type": int, "default": 0},
        ],
    )
    skeleton = resolve_skeleton(args)

    net = create_network(
        backbone_name=args.backbone_name, head_name=args.head_name,
        num_joints=args.num_joints,
        backbone_args=getattr(args, "backbone_setting", None),
        head_args=getattr(args, "head_setting", None),
    )
    image_size = args.dataset_setting["image_size"]
    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size[1], image_size[0], 3)), train=False,
    )
    if getattr(args, "ckpt", None):
        variables = load_variables(args.ckpt, variables)

    bottomup = getattr(args, "pipeline_method", "topdown") == "bottomup"
    if bottomup:
        predictor = BottomUpPredictor(
            net, variables, dataset_setting=args.dataset_setting,
            eval_setting=args.eval_setting,
            decoder_setting=getattr(args, "decoder_setting", None),
            normalize_mean=args.normalize_mean,
            normalize_std=args.normalize_std,
        )
    else:
        predictor = TopDownPredictor(
            net, variables, dataset_setting=args.dataset_setting,
            decoder_setting=getattr(args, "decoder_setting", None),
            normalize_mean=args.normalize_mean,
            normalize_std=args.normalize_std,
            decoder_name=getattr(args, "decoder_name", "topdown_heatmap")
            or "topdown_heatmap",
        )

    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        raise FileNotFoundError(args.video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(
        args.output, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
    )

    boxes = None
    if not bottomup:
        if args.boxes:
            boxes = np.array(
                [[float(v) for v in b.split(",")] for b in args.boxes],
                np.float32,
            )
        else:
            boxes = np.array([[0, 0, width, height]], np.float32)

    smoother = None
    prev_centers = None
    if not args.no_smooth:
        smoother = OneEuroFilter(
            freq=fps, min_cutoff=args.min_cutoff, beta=args.beta
        )

    frames = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if bottomup:
            people, _scores = predictor(rgb)
            people = np.asarray([p[:, :3] for p in people]) if len(people) \
                else np.zeros((0, args.num_joints, 3))
        else:
            people = np.asarray(predictor(rgb, boxes))
        if smoother is not None:
            if not people.size:
                # detection gap: drop track state so re-detections start a
                # fresh track instead of associating against stale centers
                prev_centers = None
                smoother.reset()
            else:
                # smooth coordinates only; shape change (new/lost person)
                # resets the filter via the shape check inside
                if bottomup:
                    people = _associate(people, prev_centers)
                    prev_centers = people[:, :, :2].mean(axis=1)
                people = people.copy()
                people[..., :2] = smoother(people[..., :2])
        _draw(frame, people, args.vis_thr, skeleton)
        writer.write(frame)
        frames += 1
        if args.max_frames and frames >= args.max_frames:
            break

    cap.release()
    writer.release()
    logging.info("wrote %s (%d frames @ %.1f fps)", args.output, frames, fps)


if __name__ == "__main__":
    main()

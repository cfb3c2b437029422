"""Serve a pose model over HTTP (JSON in, keypoints out).

Usage:
    python tools/serve.py --config <cfg.yaml> --ckpt <ckpt> \
        [--host 127.0.0.1] [--port 8080] [--batch-size 32]

Top-down configs serve ``POST /predict`` with optional person boxes;
bottom-up configs (pipeline_method: bottomup) find every person directly.
``GET /healthz`` reports readiness. See mindpose_tpu/engine/server.py for
the wire format. No reference counterpart (the reference has no serving
story).
"""
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
from common.log import setup_default_logging
from mindpose_tpu.config import parse_args
from mindpose_tpu.engine import (
    BottomUpPredictor,
    PoseService,
    TopDownPredictor,
    build_http_server,
)
from mindpose_tpu.models import create_network
from mindpose_tpu.utils.checkpoint import load_variables


def build_service(args, batch_size: int = 32) -> PoseService:
    net = create_network(
        backbone_name=args.backbone_name, head_name=args.head_name,
        num_joints=args.num_joints,
        backbone_args=getattr(args, "backbone_setting", None),
        head_args=getattr(args, "head_setting", None),
    )
    image_size = args.dataset_setting["image_size"]
    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size[1], image_size[0], 3)),
        train=False,
    )
    if getattr(args, "ckpt", None):
        variables = load_variables(args.ckpt, variables)

    mode = getattr(args, "pipeline_method", "topdown")
    if mode == "bottomup":
        if getattr(args, "quantize", ""):
            raise ValueError(
                "--quantize is implemented for the top-down predictor only; "
                "refusing to silently serve full-precision bottom-up weights"
            )
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
            batch_size=batch_size,
            decoder_name=getattr(args, "decoder_name", "topdown_heatmap")
            or "topdown_heatmap",
            quantize=getattr(args, "quantize", "") or "",
        )
    return PoseService(predictor, mode=mode, num_joints=args.num_joints)


def main() -> None:
    setup_default_logging()
    args = parse_args(
        description="pose HTTP server",
        extra_args=[
            {"names": ["--host"], "type": str, "default": "127.0.0.1"},
            {"names": ["--port"], "type": int, "default": 8080},
            {"names": ["--batch-size"], "type": int, "default": 32},
            {"names": ["--quantize"], "type": str, "default": "",
             "help": "weight quantization: '' or 'int8' (top-down only)"},
        ],
    )
    service = build_service(args, batch_size=args.batch_size)
    server, port = build_http_server(service, host=args.host, port=args.port)
    logging.info("serving %s (%d joints) on http://%s:%d",
                 service.mode, service.num_joints, args.host, port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()

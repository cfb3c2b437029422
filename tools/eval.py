"""Evaluation CLI: checkpoint -> COCO AP metrics.

Parity: /root/reference/tools/eval.py:25-104.

Usage:
    python tools/eval.py --config configs/hrnet/hrnet_w32_ascend.yaml --ckpt last.ckpt
"""
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from mindpose_tpu.config import parse_args
from mindpose_tpu.engine import create_evaluator, create_inferencer
from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.models import (
    create_decoder,
    create_eval_network,
    create_network,
)
from common.log import setup_default_logging
from mindpose_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def evaluate(args):
    amp = getattr(args, "amp_level", "O0")
    dtype = jnp.bfloat16 if amp not in ("O0", None) else jnp.float32

    dataset_val = create_dataset(
        args.val_root,
        args.val_label,
        dataset_format=args.dataset_format,
        is_train=False,
        use_gt_bbox_for_val=getattr(args, "val_use_gt_bbox", True),
        detection_file=getattr(args, "val_detection_result", None),
        num_workers=getattr(args, "num_parallel_workers", 4),
        config=args.dataset_setting,
    )
    loader_val = create_pipeline(
        dataset_val,
        transforms=args.val_transforms,
        method=args.pipeline_method,
        batch_size=args.batch_size,
        is_train=False,
        normalize_mean=args.normalize_mean,
        normalize_std=args.normalize_std,
        num_workers=getattr(args, "num_parallel_workers", 4),
        config=args.dataset_setting,
        # val re-decodes each frame once per person record: the decoded-frame
        # LRU elides the repeats (no shuffle at eval, records are grouped)
        decode_cache_mb=getattr(args, "decode_cache_mb", 0) or 0,
    )

    net = create_network(
        backbone_name=args.backbone_name,
        head_name=args.head_name,
        neck_name=getattr(args, "neck_name", "") or "",
        in_channels=getattr(args, "in_channels", 3),
        neck_out_channels=getattr(args, "neck_out_channels", None) or 256,
        num_joints=args.num_joints,
        backbone_args=getattr(args, "backbone_setting", None),
        neck_args=getattr(args, "neck_setting", None),
        head_args=getattr(args, "head_setting", None),
        dtype=dtype,
    )
    image_size = args.dataset_setting["image_size"]
    dummy = jnp.zeros((1, image_size[1], image_size[0], 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)

    if not getattr(args, "ckpt", None):
        raise ValueError("--ckpt is required for evaluation")
    # checkpoints store the full TrainState; accept raw variables too
    from mindpose_tpu.utils.checkpoint import load_variables

    variables = load_variables(args.ckpt, variables)

    decoder = create_decoder(
        args.decoder_name, **(getattr(args, "decoder_setting", None) or {})
    )
    eval_net = create_eval_network(
        net, decoder, output_raw=args.eval_setting.get("has_heatmap_output", True)
    )
    # fan inference out across all local devices (sharded_eval=False for
    # the reference's single-device eval behavior). Skip when the pipeline
    # forced batch_size=1 (variable-shape bottom-up eval): padding each
    # batch with D-1 copies of the same image only multiplies compute and
    # compile cost.
    mesh = None
    if (
        jax.device_count() > 1
        and args.eval_setting.get("sharded_eval", True)
        and getattr(loader_val, "batch_size", 1) > 1
    ):
        from mindpose_tpu.parallel import create_mesh

        mesh = create_mesh()
    inferencer = create_inferencer(
        eval_net,
        name=args.inference_method,
        config=args.eval_setting,
        dataset_config=args.dataset_setting,
        mesh=mesh,
    )
    evaluator = create_evaluator(
        args.val_label,
        name=args.eval_method,
        metric=args.eval_metric,
        config=args.eval_setting,
        dataset_config=args.dataset_setting,
        num_joints=args.num_joints,
    )

    outputs = inferencer(loader_val, variables=variables)
    result = evaluator(outputs)
    logging.info("evaluation result: %s", result)

    result_path = getattr(args, "result_path", "./result.json")
    with open(result_path, "w") as f:
        json.dump({k: float(v) for k, v in result.items()}, f, indent=4)
    logging.info("result saved to %s", result_path)
    return result


def main() -> None:
    setup_default_logging()
    args = parse_args(description="mindpose_tpu evaluation")
    evaluate(args)


if __name__ == "__main__":
    main()

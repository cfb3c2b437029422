"""BottomUpPredictor serving API: raw RGB image -> multi-person keypoints.

Beyond-reference (the reference stops at dataset-driven eval); wraps the full
bottom-up path — rescale/pad, jitted forward + AE decode, tag grouping,
coordinate rescale — behind one call.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

import mindpose_tpu as mp
from helpers import make_tiny_coco

# registers the tiny_test_backbone used below
from engine import test_train_eval_e2e  # noqa: F401


SETTING = {
    "image_size": [64, 64],
    "max_image_size": [96, 64],
    "heatmap_sizes": [[16, 16], [32, 32]],
    "sigma": 2.0,
    "expand_mask": True,
    "pixel_std": 200.0,
    "tag_per_joint": True,
    "flip_pairs": [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]],
}

EVAL_SETTING = {
    "has_heatmap_output": True,
    "hflip_tta": False,
    "downsample_scale": 2,
    "vis_thr": 0.1,
    "oks_thr": 0.9,
    "tag_thr": 1.0,
    "joint_order": [0, 1, 2, 3, 4, 5, 6, 11, 12, 7, 8, 9, 10, 13, 14, 15, 16],
    "ignore_too_much": False,
    "use_rounded_norm": True,
    "use_nms": False,
    "soft_nms": False,
    "refine_missing_joint": True,
}


def test_bottomup_predictor(tmp_path):
    import cv2

    from mindpose_tpu.engine import BottomUpPredictor

    img_root, ann = make_tiny_coco(str(tmp_path))
    net = mp.create_network(
        "tiny_test_backbone", "higher_hrnet_head",
        head_args={"with_ae_loss": (True, False), "num_deconv_filters": (32,)},
    )
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )

    predictor = BottomUpPredictor(
        net,
        variables,
        dataset_setting=SETTING,
        eval_setting=EVAL_SETTING,
        decoder_setting=dict(
            num_joints=17, num_stages=2, with_ae_loss=(True, False),
            use_nms=True, nms_kernel=3, max_num=10,
        ),
    )

    img = cv2.cvtColor(
        cv2.imread(f"{img_root}/000000000001.jpg"), cv2.COLOR_BGR2RGB
    )
    preds, scores = predictor(img)
    # untrained net: predictions are meaningless but must be well-formed
    assert preds.ndim == 3 and preds.shape[1] == 17 and preds.shape[2] >= 3
    assert scores.shape == (preds.shape[0],)
    assert np.isfinite(preds).all()
    # coordinates land in the original image frame (with slack)
    h, w = img.shape[:2]
    assert (preds[..., 0] >= -w).all() and (preds[..., 0] <= 2 * w).all()

    # portrait input exercises the square-pad path with the same compiled fn
    preds2, scores2 = predictor(np.ascontiguousarray(img.transpose(1, 0, 2)))
    assert preds2.ndim == 3 and np.isfinite(preds2).all()

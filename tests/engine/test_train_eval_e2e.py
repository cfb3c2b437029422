"""End-to-end slices: config -> data -> train -> infer -> COCO AP.

Top-down: overfit a tiny registered backbone on tiny-COCO (no augmentation)
until the evaluator reports real AP. Bottom-up: full pipeline smoke (loader ->
AE loss step -> decoder -> tag grouping -> evaluator).
"""
import sys
import tempfile

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

import mindpose_tpu as mp
from helpers import make_tiny_coco
from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.engine import create_evaluator, create_inferencer
from mindpose_tpu.models.backbones.backbone import Backbone
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.parallel import build_train_step, create_train_state
from mindpose_tpu.register import has_component, register

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow



if not has_component("backbone", "tiny_test_backbone"):

    @register("backbone")
    def tiny_test_backbone(pretrained=False, ckpt_url="", in_channels=3, dtype=jnp.float32, **kw):
        class _Tiny(Backbone):
            @property
            def out_channels(self):
                return 32

            @nn.compact
            def __call__(self, x, train=True):
                x = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME")(x)
                x = nn.relu(x)
                x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME")(x)
                x = nn.relu(x)
                x = nn.Conv(32, (3, 3), padding="SAME")(x)
                return nn.relu(x)

        return _Tiny()


TINY_SETTING = {
    "image_size": [64, 64],
    "heatmap_size": [16, 16],
    "pixel_std": 200.0,
    "scale_padding": 1.25,
    "det_bbox_thr": 0.0,
    "flip_pairs": [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]],
    "upper_body_ids": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
}

EVAL_SETTING = {
    "has_heatmap_output": True,
    "hflip_tta": False,
    "shift_heatmap": False,
    "vis_thr": 0.2,
    "oks_thr": 0.9,
    "use_nms": True,
    "soft_nms": False,
    "sigmas": [0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
               0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089],
}


@pytest.fixture(scope="module")
def tiny_coco():
    root = tempfile.mkdtemp()
    return make_tiny_coco(root, num_images=4, people_per_img=1)


def test_topdown_train_to_ap(tiny_coco):
    img_root, ann = tiny_coco
    # deterministic pipeline (no augmentation) for overfitting
    transforms = [
        "topdown_box_to_center_scale",
        "topdown_affine",
        {"topdown_generate_target": {"sigma": 1.5}},
    ]
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=True, config=TINY_SETTING,
                        use_gt_bbox_for_val=True)
    loader = create_pipeline(ds, transforms, method="topdown", batch_size=4,
                             is_train=True, config=TINY_SETTING, num_workers=2)

    net = mp.create_network("tiny_test_backbone", "hrnet_head")
    loss = mp.create_loss("joint_mse", use_target_weight=True)
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    tx = create_optimizer(variables["params"], "adam", learning_rate=2e-3)
    state = create_train_state(variables, tx)
    step_fn = build_train_step(nwl, tx, mesh=None, donate=False)

    first_loss = last_loss = None
    for epoch in range(60):
        for batch in loader:
            state, lv = step_fn(
                state,
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["target"]),
                jnp.asarray(batch["target_weight"]),
            )
        if first_loss is None:
            first_loss = float(jnp.sum(lv))
    last_loss = float(jnp.sum(lv))
    assert last_loss < first_loss * 0.5

    # ---- eval path ----
    vds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                         is_train=False, config=TINY_SETTING,
                         use_gt_bbox_for_val=True)
    vloader = create_pipeline(vds, ["topdown_box_to_center_scale", "topdown_affine"],
                              method="topdown", batch_size=4, is_train=False,
                              config=TINY_SETTING)
    decoder = mp.create_decoder("topdown_heatmap", shift_coordinate=True)
    eval_net = mp.create_eval_network(net, decoder, output_raw=True)
    inferencer = create_inferencer(eval_net, name="topdown_heatmap",
                                   config=EVAL_SETTING, dataset_config=TINY_SETTING)
    evaluator = create_evaluator(ann, name="topdown", metric=["AP"],
                                 config=EVAL_SETTING, dataset_config=TINY_SETTING)
    outputs = inferencer(
        vloader, variables={"params": state.params, "batch_stats": state.batch_stats}
    )
    assert len(outputs) == 4
    result = evaluator(outputs)
    assert set(result) >= {"AP", "AP .5", "AR"}
    # overfitted on 4 images: loose AP at OKS .5 must be well above chance
    assert result["AP .5"] > 0.2, result

    # int8 weight-only quantization preserves the trained AP (the dequant
    # here is numerically identical to the in-jit dequant the serving path
    # uses — int8 -> f32 * scale either way; models/quantize.py)
    from mindpose_tpu.models.quantize import (
        dequantize_variables,
        quantize_variables,
    )

    qvars = dequantize_variables(quantize_variables(
        {"params": state.params, "batch_stats": state.batch_stats}))
    result_q = evaluator(inferencer(vloader, variables=qvars))
    assert result_q["AP .5"] >= result["AP .5"] - 1e-6, (result_q, result)


BOTTOMUP_SETTING = {
    "image_size": [64, 64],
    "max_image_size": [96, 64],
    "heatmap_sizes": [[16, 16], [32, 32]],
    "sigma": 2.0,
    "expand_mask": True,
    "pixel_std": 200.0,
    "tag_per_joint": True,
    "flip_pairs": [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]],
}

BOTTOMUP_EVAL_SETTING = {
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
    "sigmas": EVAL_SETTING["sigmas"],
}


def test_bottomup_pipeline_smoke(tiny_coco):
    img_root, ann = tiny_coco
    ds = create_dataset(img_root, ann, dataset_format="coco_bottomup",
                        is_train=True, config=BOTTOMUP_SETTING)
    loader = create_pipeline(
        ds,
        [
            {"bottomup_random_affine": {"rot_factor": 10, "scale_factor": [0.9, 1.1]}},
            {"bottomup_horizontal_random_flip": {"flip_prob": 0.5}},
            {"bottomup_generate_target": {"sigma": 2.0, "max_num": 30}},
        ],
        method="bottomup", batch_size=2, is_train=True,
        config=BOTTOMUP_SETTING, num_workers=2,
    )
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["target"].shape == (2, 2, 32, 32, 17)
    assert batch["mask"].shape == (2, 2, 32, 32)
    assert batch["tag_ind"].shape == (2, 2, 30, 17, 2)

    # AE multi loss consumes the batch and produces a finite grad
    net = mp.create_network(
        "tiny_test_backbone", "higher_hrnet_head",
        head_args={"with_ae_loss": (True, False), "num_deconv_filters": (32,)},
    )
    loss = mp.create_loss(
        "ae_multi_loss", num_joints=17, num_stages=2,
        stage_sizes=[[16, 16], [32, 32]],
        with_mse_loss=[True, True], with_ae_loss=[True, False],
    )
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    tx = create_optimizer(variables["params"], "adam", learning_rate=1e-3)
    state = create_train_state(variables, tx)
    step_fn = build_train_step(nwl, tx, mesh=None, donate=False)
    state, lv = step_fn(
        state,
        jnp.asarray(batch["image"]),
        jnp.asarray(batch["target"]),
        jnp.asarray(batch["mask"].astype(np.float32)),
        jnp.asarray(batch["tag_ind"]),
    )
    assert np.isfinite(np.asarray(lv)).all()
    assert lv.shape == (3,)

    # ---- val pipeline + inferencer + evaluator ----
    vds = create_dataset(img_root, ann, dataset_format="coco_bottomup",
                         is_train=False, config=BOTTOMUP_SETTING)
    vloader = create_pipeline(vds, ["bottomup_rescale", "bottomup_pad"],
                              method="bottomup", batch_size=1, is_train=False,
                              config=BOTTOMUP_SETTING)
    decoder = mp.create_decoder(
        "bottomup_heatmap_ae", num_joints=17, num_stages=2,
        with_ae_loss=(True, False), use_nms=True, nms_kernel=3, max_num=10,
    )
    eval_net = mp.create_eval_network(net, decoder, output_raw=True)
    inferencer = create_inferencer(eval_net, name="bottomup_heatmap_ae",
                                   config=BOTTOMUP_EVAL_SETTING,
                                   dataset_config=BOTTOMUP_SETTING)
    evaluator = create_evaluator(ann, name="bottomup", metric=["AP"],
                                 config=BOTTOMUP_EVAL_SETTING,
                                 dataset_config=BOTTOMUP_SETTING)
    outputs = inferencer(
        vloader, variables={"params": state.params, "batch_stats": state.batch_stats}
    )
    assert len(outputs) == 4
    result = evaluator(outputs)
    assert "AP" in result  # untrained: value is meaningless, pipeline must run

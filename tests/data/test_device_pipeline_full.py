"""device_pipeline: full — on-device warp parity through the real loader.

Host path: cv2.warpAffine in the worker (reference HOT LOOP #1,
topdown_transform.py:217). Full device path: workers emit whole uint8 frames
(zero-padded to size buckets) + 2x3 warp matrices (hflip folded in), and
warp + normalize + Gaussian encode run fused on device. Crops, keypoints and
targets must match the host pipeline.
"""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers import make_tiny_coco
from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.data.device_pipeline import (
    DEVICE_FULL_FINAL_COLUMNS,
    build_topdown_full_preprocess,
    strip_host_target_transform,
    to_matrix_transforms,
)

from tests.engine.test_train_eval_e2e import TINY_SETTING  # noqa: F401

MEAN = [0.485, 0.456, 0.406]
STD = [0.229, 0.224, 0.225]


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco_dp"))
    return make_tiny_coco(root, num_images=4, people_per_img=2)


HOST_TRANSFORMS = [
    "topdown_box_to_center_scale",
    {"topdown_horizontal_random_flip": {"flip_prob": 1.0}},  # deterministic
    "topdown_affine",
    {"topdown_generate_target": {"sigma": 1.5}},
]


def _host_batch(fixture, normalize):
    img_root, ann = fixture
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=False, config=TINY_SETTING,
                        use_gt_bbox_for_val=True)
    loader = create_pipeline(
        ds, HOST_TRANSFORMS, method="topdown", batch_size=8, is_train=False,
        normalize=normalize, config=TINY_SETTING,
        final_columns=["image", "keypoints", "target", "target_weight",
                       "bbox_ids"],
    )
    return next(iter(loader))


def _device_batch(fixture):
    img_root, ann = fixture
    transforms, target_kwargs = strip_host_target_transform(HOST_TRANSFORMS)
    transforms = to_matrix_transforms(transforms)
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=False, config=TINY_SETTING,
                        use_gt_bbox_for_val=True)
    loader = create_pipeline(
        ds, transforms, method="topdown", batch_size=8, is_train=False,
        normalize=False, config=TINY_SETTING,
        final_columns=DEVICE_FULL_FINAL_COLUMNS + ["bbox_ids"],
        image_bucket=64,
    )
    batch = next(iter(loader))
    preprocess = build_topdown_full_preprocess(
        image_size=TINY_SETTING["image_size"],
        heatmap_size=TINY_SETTING["heatmap_size"],
        normalize_mean=MEAN, normalize_std=STD, **target_kwargs,
    )
    crops, target, weight = preprocess(
        jnp.asarray(batch["image"]), jnp.asarray(batch["warp_mat"]),
        jnp.asarray(batch["keypoints"]),
    )
    return batch, np.asarray(crops), np.asarray(target), np.asarray(weight)


def test_full_device_pipeline_matches_host(fixture):
    host = _host_batch(fixture, normalize=False)
    dev_batch, crops, target, weight = _device_batch(fixture)

    # frames were bucketed: padded to multiples of 64, uint8 preserved
    n, bh, bw, _ = dev_batch["image"].shape
    assert bh % 64 == 0 and bw % 64 == 0
    assert dev_batch["image"].dtype == np.uint8

    # identical geometry metadata (same record order, deterministic flip)
    np.testing.assert_array_equal(host["bbox_ids"], dev_batch["bbox_ids"])
    np.testing.assert_allclose(host["keypoints"], dev_batch["keypoints"],
                               atol=1e-4)

    # crop parity vs cv2.warpAffine (uint8 rounding tolerance)
    un_normalized = crops * (np.asarray(STD) * 255.0) + np.asarray(MEAN) * 255.0
    diff = np.abs(un_normalized - host["image"].astype(np.float32))
    assert diff.max() <= 1.0 + 1e-3, diff.max()

    # target encode parity (host Gaussian rasterization is the oracle)
    np.testing.assert_allclose(target, host["target"], atol=1e-5)
    np.testing.assert_allclose(weight, host["target_weight"], atol=1e-6)


def test_full_device_pipeline_trains(fixture):
    """The preprocess hook slots into build_train_step and the loss is finite."""
    import jax

    import mindpose_tpu as mp
    from mindpose_tpu.optim import create_optimizer
    from mindpose_tpu.parallel import build_train_step, create_train_state

    dev_batch, _, _, _ = _device_batch(fixture)

    transforms, target_kwargs = strip_host_target_transform(HOST_TRANSFORMS)
    preprocess = build_topdown_full_preprocess(
        image_size=TINY_SETTING["image_size"],
        heatmap_size=TINY_SETTING["heatmap_size"],
        normalize_mean=MEAN, normalize_std=STD, **target_kwargs,
    )
    net = mp.create_network("tiny_test_backbone", "hrnet_head")
    loss = mp.create_loss("joint_mse", use_target_weight=True)
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)
    tx = create_optimizer(variables["params"], "adam", learning_rate=1e-3)
    state = create_train_state(variables, tx)
    step_fn = build_train_step(nwl, tx, mesh=None, donate=False,
                               preprocess=preprocess)
    state, lv = step_fn(
        state, jnp.asarray(dev_batch["image"]),
        jnp.asarray(dev_batch["warp_mat"]),
        jnp.asarray(dev_batch["keypoints"]),
    )
    assert np.isfinite(np.asarray(lv)).all()

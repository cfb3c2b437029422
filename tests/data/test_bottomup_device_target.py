"""On-device bottom-up target encode: parity with the host encoder.

The host BottomUpGenerateTarget is itself oracle-fuzzed against the
reference (tests/parity_oracle), so host parity here transitively pins the
device path to the reference semantics.
"""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

from mindpose_tpu.data.transform.bottomup_transform import (
    BottomUpGenerateTagInd,
    BottomUpGenerateTarget,
)
from mindpose_tpu.ops.target import generate_bottomup_targets

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


CFG = {
    "image_size": [256, 256],
    "max_image_size": [256, 256],
    "heatmap_sizes": [[64, 64], [128, 128]],
    "flip_pairs": [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                   [13, 14], [15, 16]],
    "pixel_std": 200.0,
    "tag_per_joint": True,
}


def _random_keypoints(rng, m, k=17, sizes=((64, 64), (128, 128))):
    """Per-level keypoints [S, M, K, 3]: mostly in-map, some OOB/invisible."""
    out = []
    for w, h in sizes:
        pts = np.stack([
            rng.uniform(-10, w + 10, (m, k)),
            rng.uniform(-10, h + 10, (m, k)),
            rng.choice([0, 1, 2], (m, k), p=[0.2, 0.3, 0.5]).astype(float),
        ], axis=-1)
        out.append(pts)
    return np.stack(out)  # float64, like the host pipeline


@pytest.mark.parametrize("sigma", [2.0, 1.5, 2.6])
@pytest.mark.parametrize("m", [1, 5, 13])
def test_device_targets_match_host(sigma, m):
    rng = np.random.RandomState(hash((sigma, m)) % 2**31)
    kpts = _random_keypoints(rng, m)

    host = BottomUpGenerateTarget(config=CFG, sigma=sigma, max_num=30)
    host_out = host({"keypoints": kpts.copy()})
    # [S, Hmax, Wmax, K] (levels padded to max)

    for lvl, (w, h) in enumerate([(64, 64), (128, 128)]):
        dev = np.asarray(generate_bottomup_targets(
            jnp.asarray(kpts[None, lvl], jnp.float32),
            heatmap_size=(w, h), sigma=sigma))[0]
        # host computes exp in float64, device in float32: atol covers the
        # fp32 rounding of exp() only — no structural difference
        np.testing.assert_allclose(
            dev, host_out["target"][lvl, :h, :w], atol=1e-5,
            err_msg=f"level {lvl} sigma {sigma} m {m}")


def test_tag_ind_transform_matches_host_and_pads():
    rng = np.random.RandomState(7)
    kpts = _random_keypoints(rng, 4)

    host = BottomUpGenerateTarget(config=CFG, sigma=2.0, max_num=30)
    host_out = host({"keypoints": kpts.copy()})
    tag = BottomUpGenerateTagInd(config=CFG, sigma=2.0, max_num=30)
    tag_out = tag({"keypoints": kpts.copy()})

    np.testing.assert_array_equal(tag_out["tag_ind"], host_out["tag_ind"])
    assert tag_out["keypoints"].shape == (2, 30, 17, 3)
    np.testing.assert_allclose(tag_out["keypoints"][:, :4], kpts, atol=1e-6)
    assert (tag_out["keypoints"][:, 4:] == 0).all()


def test_bottomup_preprocess_end_to_end_shapes():
    from mindpose_tpu.data.device_pipeline import build_bottomup_preprocess

    rng = np.random.RandomState(3)
    pre = build_bottomup_preprocess(
        heatmap_sizes=[[64, 64], [128, 128]],
        normalize_mean=[0.485, 0.456, 0.406],
        normalize_std=[0.229, 0.224, 0.225], sigma=2.0)
    n = 2
    image = rng.randint(0, 255, (n, 256, 256, 3), np.uint8)
    kpts = np.stack([_random_keypoints(rng, 30) for _ in range(n)])
    mask = np.ones((n, 2, 128, 128), np.uint8)
    tag_ind = np.zeros((n, 2, 30, 17, 2), np.int32)
    img, target, mask_o, tag_o = pre(
        jnp.asarray(image), jnp.asarray(kpts, jnp.float32),
        jnp.asarray(mask), jnp.asarray(tag_ind))
    assert img.shape == (n, 256, 256, 3) and img.dtype == jnp.float32
    assert target.shape == (n, 2, 128, 128, 17)
    assert np.asarray(target).max() <= 1.0 + 1e-6
    # level 0 (64x64) is zero-padded out to 128
    assert np.asarray(target)[:, 0, 64:, :, :].sum() == 0
    assert np.asarray(target)[:, 0, :64, :64, :].sum() > 0


def test_bottomup_device_pipeline_loss_matches_host(tmp_path):
    """Full loop: same augmentation draws -> host-encoded step loss ==
    device-encoded step loss (the encode is the only difference)."""
    import jax
    import mindpose_tpu as mp
    from helpers import make_tiny_coco
    from mindpose_tpu.data import create_dataset, create_pipeline
    from mindpose_tpu.data.device_pipeline import (
        BOTTOMUP_DEVICE_FINAL_COLUMNS,
        build_bottomup_preprocess,
    )
    from mindpose_tpu.optim import create_optimizer
    from mindpose_tpu.parallel import build_train_step, create_train_state
    from tests.engine.test_train_eval_e2e import BOTTOMUP_SETTING

    img_root, ann = make_tiny_coco(str(tmp_path), num_images=4,
                                   people_per_img=2)
    mean, std = [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]

    def batches(device_mode):
        ds = create_dataset(img_root, ann, dataset_format="coco_bottomup",
                            is_train=True, config=BOTTOMUP_SETTING)
        target_t = ("bottomup_generate_tag_ind" if device_mode
                    else "bottomup_generate_target")
        loader = create_pipeline(
            ds,
            [{"bottomup_random_affine": {"rot_factor": 10,
                                         "scale_factor": [0.9, 1.1]}},
             {target_t: {"sigma": 2.0, "max_num": 30}}],
            method="bottomup", batch_size=4, is_train=True,
            config=BOTTOMUP_SETTING, num_workers=1, seed=5,
            normalize=not device_mode, normalize_mean=mean,
            normalize_std=std,
            final_columns=(BOTTOMUP_DEVICE_FINAL_COLUMNS if device_mode
                           else None))
        np.random.seed(42)  # aug draws come from the global stream
        return next(iter(loader))

    host_b = batches(False)
    dev_b = batches(True)

    net = mp.create_network(
        "tiny_test_backbone", "higher_hrnet_head",
        head_args={"with_ae_loss": (True, False),
                   "num_deconv_filters": (32,)})
    loss = mp.create_loss(
        "ae_multi_loss", num_joints=17, num_stages=2,
        stage_sizes=[[16, 16], [32, 32]],
        with_mse_loss=[True, True], with_ae_loss=[True, False])
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)
    tx = create_optimizer(variables["params"], "adam", learning_rate=1e-3)

    state = create_train_state(variables, tx)
    step = build_train_step(nwl, tx, mesh=None, donate=False)
    _, lv_host = step(
        state, jnp.asarray(host_b["image"]), jnp.asarray(host_b["target"]),
        jnp.asarray(host_b["mask"].astype(np.float32)),
        jnp.asarray(host_b["tag_ind"]))

    pre = build_bottomup_preprocess(
        heatmap_sizes=BOTTOMUP_SETTING["heatmap_sizes"],
        normalize_mean=mean, normalize_std=std, sigma=2.0)
    state2 = create_train_state(variables, tx)
    step_dev = build_train_step(nwl, tx, mesh=None, donate=False,
                                preprocess=pre)
    _, lv_dev = step_dev(
        state2, jnp.asarray(dev_b["image"]), jnp.asarray(dev_b["keypoints"]),
        jnp.asarray(dev_b["mask"]), jnp.asarray(dev_b["tag_ind"]))

    np.testing.assert_allclose(np.asarray(lv_dev), np.asarray(lv_host),
                               rtol=2e-4, atol=1e-6)

"""RLE regression family: head shapes, targets, loss, decode, TTA."""
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import mindpose_tpu as mp
from mindpose_tpu.data.transform.topdown_transform import (
    TopDownGenerateRegressionTarget,
)
from mindpose_tpu.models.networks import Net
import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


SETTING = {
    "image_size": [48, 64],  # (W, H)
    "heatmap_size": [12, 16],
    "pixel_std": 200.0,
    "scale_padding": 1.25,
    "flip_pairs": [[1, 2]],
    "upper_body_ids": [0],
}


class TinyBackbone(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Conv(8, (3, 3), strides=(8, 8), padding="SAME")(x)
        return nn.relu(x)


def _net(num_joints=3):
    head = mp.create_head("rle_head", in_channels=8, num_joints=num_joints)
    return Net(backbone=TinyBackbone(), head=head)


def test_head_output_shapes():
    net = _net()
    x = jnp.zeros((2, 64, 48, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    mu, sigma = net.apply(variables, x, train=False)
    assert mu.shape == (2, 3, 2)
    assert sigma.shape == (2, 3, 2)
    assert mu.dtype == jnp.float32
    s = np.asarray(sigma)
    assert np.all(s > 0) and np.all(s < 1)


def test_regression_target_transform():
    t = TopDownGenerateRegressionTarget(config=SETTING)
    kps = np.array([[12.0, 32.0, 2.0],   # visible, inside
                    [47.9, 63.9, 2.0],   # near the far edge, inside
                    [10.0, 20.0, 0.0],   # invisible
                    [60.0, 20.0, 2.0]],  # x outside the input -> weight 0
                   np.float32)
    out = t.transform({"keypoints": kps})
    target, weight = out["target"], out["target_weight"]
    assert target.shape == (4, 2)
    np.testing.assert_array_equal(weight, [1, 1, 0, 0])
    np.testing.assert_allclose(target[0], [12.0 / 48, 32.0 / 64], rtol=1e-6)
    np.testing.assert_allclose(target[1], [47.9 / 48, 63.9 / 64], rtol=1e-6)
    assert target[2].sum() == 0 and target[3].sum() == 0


def test_rle_loss_golden_values():
    """Hand-computed Laplace and Gaussian NLL on a single joint."""
    mu = jnp.asarray([[[0.5, 0.5]]])
    sigma = jnp.asarray([[[0.2, 0.1]]])
    target = jnp.asarray([[[0.6, 0.45]]])
    weight = jnp.ones((1, 1))

    lap = mp.create_loss("rle", use_target_weight=True,
                         q_distribution="laplace")
    # per axis: log(2 sigma) + |err|/sigma
    want = (math.log(2 * 0.2) + 0.1 / 0.2) + (math.log(2 * 0.1) + 0.05 / 0.1)
    got = float(lap((mu, sigma), target, weight))
    np.testing.assert_allclose(got, want, rtol=1e-4)

    gau = mp.create_loss("rle", use_target_weight=True,
                         q_distribution="gaussian")
    want_g = (math.log(0.2 * math.sqrt(2 * math.pi)) + 0.5 * (0.1 / 0.2) ** 2
              + math.log(0.1 * math.sqrt(2 * math.pi))
              + 0.5 * (0.05 / 0.1) ** 2)
    got_g = float(gau((mu, sigma), target, weight))
    np.testing.assert_allclose(got_g, want_g, rtol=1e-4)


def test_rle_loss_masks_and_learns():
    loss_fn = mp.create_loss("rle", use_target_weight=True)
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.uniform(0.1, 0.9, (2, 3, 2)).astype(np.float32))
    weight = np.ones((2, 3), np.float32)

    def value(params):
        mu, raw_sigma = params
        return loss_fn((mu, jax.nn.sigmoid(raw_sigma)), target,
                       jnp.asarray(weight))

    params0 = (jnp.full((2, 3, 2), 0.5), jnp.zeros((2, 3, 2)))
    l0 = float(value(params0))
    g = jax.grad(lambda p: value(p))(params0)
    params1 = jax.tree.map(lambda p, gg: p - 0.1 * gg, params0, g)
    assert float(value(params1)) < l0
    # masked joints contribute nothing: zeroing a joint lowers the loss sum
    weight0 = weight.copy()
    weight0[:, 1] = 0.0
    masked = mp.create_loss("rle", use_target_weight=True, reduction="sum")
    full = float(masked((params0[0], jax.nn.sigmoid(params0[1])), target,
                        jnp.asarray(weight)))
    part = float(masked((params0[0], jax.nn.sigmoid(params0[1])), target,
                        jnp.asarray(weight0)))
    assert part != full


def test_decoder_original_frame_matches_heatmap_formula():
    """to_original mapping == the heatmap decoder's with hw = input size."""
    dec = mp.create_decoder("regression", input_size=[48, 64])
    mu = jnp.asarray([[[0.5, 0.5]]])  # crop center
    sigma = jnp.full((1, 1, 2), 0.1)
    center = jnp.asarray([[100.0, 200.0]])
    scale = jnp.asarray([[0.6, 0.8]])
    preds, boxes = dec((mu, sigma), center, scale, jnp.ones((1,)))
    # 24 px -> x = 24 * (0.6*200/48) + 100 - 0.6*200/2 = 100; same for y
    np.testing.assert_allclose(np.asarray(preds)[0, 0, :2], [100.0, 200.0],
                               rtol=1e-5)
    # score = 1 - mean(sigma)
    np.testing.assert_allclose(np.asarray(preds)[0, 0, 2], 0.9, rtol=1e-5)
    assert boxes.shape == (1, 6)


def test_regression_flip_tta_algebra():
    """The x-mirror map (1 - 1/W - mu) + pair permutation recovers the
    unflipped coordinates exactly from ideal stub predictions."""
    from mindpose_tpu.data.transform.utils import fliplr_joints
    from mindpose_tpu.engine.inferencer.regression_inferencer import (
        RegressionInferencer,
    )

    W, H = 48, 64
    kps = np.array([[10.0, 20.0, 2.0], [33.5, 47.0, 2.0], [5.0, 60.0, 2.0]],
                   np.float32)
    flipped_kps = fliplr_joints(kps, W, flip_index=[0, 2, 1])

    lo = (jnp.asarray(kps[None, :, :2] / np.array([W, H], np.float32)),
          jnp.full((1, 3, 2), 0.2))
    lf = (jnp.asarray(
        flipped_kps[None, :, :2] / np.array([W, H], np.float32)),
        jnp.full((1, 3, 2), 0.2))

    decoder = mp.create_decoder("regression", input_size=[W, H],
                                to_original=False)

    class _StubNet:
        """flag pixel [0,0,0,0] is 0 on the original, 1 after the mirror."""
        output_raw = False
        decoder = None

        def apply(self, variables, image, train=False):
            flag = image[0, 0, 0, 0]
            return tuple((1.0 - flag) * a + flag * b
                         for a, b in zip(lo, lf))

    class _StubEvalNet:
        net = _StubNet()
        output_raw = False
        decoder = None

    inferencer = RegressionInferencer(
        _StubEvalNet(), decoder=decoder,
        config={"hflip_tta": True, "flip_pairs": [[1, 2]],
                "batch_size": None},
    )
    fwd = inferencer._build_forward()
    image = np.zeros((1, H, W, 3), np.float32)
    image[0, 0, W - 1, 0] = 1.0  # lands on [0,0,0,0] after the mirror
    preds, _ = fwd({}, jnp.asarray(image), jnp.zeros((1, 2)),
                   jnp.ones((1, 2)), jnp.ones((1,)))
    got = np.asarray(preds)[0, :, :2]
    np.testing.assert_allclose(got, kps[:, :2], atol=1e-4)


def test_regression_device_encode_matches_host():
    """ops/target.generate_regression_targets == the host transform."""
    from mindpose_tpu.ops.target import generate_regression_targets

    t = TopDownGenerateRegressionTarget(config=SETTING)
    rng = np.random.RandomState(3)
    kps = np.concatenate(
        [rng.uniform(-10, 58, (6, 3, 1)),     # some x outside [0, 48)
         rng.uniform(-10, 74, (6, 3, 1)),     # some y outside [0, 64)
         rng.choice([0.0, 1.0, 2.0], (6, 3, 1))], axis=-1).astype(np.float32)

    host_t = np.stack([t.transform({"keypoints": k})["target"] for k in kps])
    host_w = np.stack(
        [t.transform({"keypoints": k})["target_weight"] for k in kps])
    dev_t, dev_w = generate_regression_targets(
        jnp.asarray(kps), input_size=(48, 64))
    np.testing.assert_array_equal(np.asarray(dev_w), host_w)
    np.testing.assert_allclose(np.asarray(dev_t), host_t, atol=1e-6)


def test_tiny_train_loss_decreases():
    from mindpose_tpu.parallel import build_train_step, create_train_state

    net = _net()
    loss = mp.create_loss("rle", use_target_weight=True)
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)),
                         train=False)
    tx = mp.create_optimizer(variables["params"], "adamw", learning_rate=1e-2)
    state = create_train_state(variables, tx)
    step = build_train_step(nwl, tx, donate=False)

    t = TopDownGenerateRegressionTarget(config=SETTING)
    rng = np.random.RandomState(1)
    images, targets, weights = [], [], []
    for _ in range(8):
        kps = np.concatenate(
            [rng.uniform(5, 43, (3, 1)), rng.uniform(5, 59, (3, 1)),
             np.full((3, 1), 2.0)], axis=1).astype(np.float32)
        out = t.transform({"keypoints": kps})
        images.append(rng.rand(64, 48, 3).astype(np.float32))
        targets.append(out["target"])
        weights.append(out["target_weight"])
    batch = [jnp.asarray(np.stack(x)) for x in (images, targets, weights)]

    losses = []
    for _ in range(10):
        state, lv = step(state, *batch)
        losses.append(float(jnp.sum(lv)))
    assert losses[-1] < losses[0]

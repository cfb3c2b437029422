"""SimCC family: head shapes, label encoding, loss, and decode round trip."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import mindpose_tpu as mp
from mindpose_tpu.data.transform.topdown_transform import (
    TopDownGenerateSimCCTarget,
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
    head = mp.create_head(
        "simcc_head", in_channels=8, num_joints=num_joints,
        input_size=(48, 64), split_ratio=2.0)
    return Net(backbone=TinyBackbone(), head=head)


def test_head_output_shapes():
    net = _net()
    x = jnp.zeros((2, 64, 48, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    xl, yl = net.apply(variables, x, train=False)
    assert xl.shape == (2, 3, 96)  # W * ratio
    assert yl.shape == (2, 3, 128)  # H * ratio
    assert xl.dtype == jnp.float32


def test_simcc_target_distributions():
    t = TopDownGenerateSimCCTarget(config=SETTING, sigma=2.0, split_ratio=2.0)
    kps = np.array([[10.0, 20.0, 2.0],   # visible, inside
                    [47.9, 63.9, 2.0],   # near the far edge, inside
                    [10.0, 20.0, 0.0],   # invisible
                    [60.0, 20.0, 2.0]],  # x outside the input -> weight 0
                   np.float32)
    out = t.transform({"keypoints": kps})
    target, weight = out["target"], out["target_weight"]
    assert target.shape == (4, 96 + 128)
    np.testing.assert_array_equal(weight, [1, 1, 0, 0])
    # peaks at round(x * ratio) bins; each axis sums to 1 for visible joints
    assert int(np.argmax(target[0, :96])) == 20
    assert int(np.argmax(target[0, 96:])) == 40
    np.testing.assert_allclose(target[0, :96].sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(target[0, 96:].sum(), 1.0, rtol=1e-5)
    assert target[2].sum() == 0 and target[3].sum() == 0


def test_encode_decode_round_trip():
    """Ideal logits from the encoder's own labels decode to the keypoints."""
    t = TopDownGenerateSimCCTarget(config=SETTING, sigma=2.0, split_ratio=2.0)
    kps = np.array([[10.0, 20.0, 2.0], [33.5, 47.25, 2.0], [5.0, 60.0, 2.0]],
                   np.float32)
    target = t.transform({"keypoints": kps})["target"]
    logits_x = jnp.log(jnp.asarray(target[None, :, :96]) + 1e-12)
    logits_y = jnp.log(jnp.asarray(target[None, :, 96:]) + 1e-12)

    dec = mp.create_decoder(
        "simcc", input_size=[48, 64], split_ratio=2.0, sigma=2.0,
        to_original=False)
    preds, boxes = dec((logits_x, logits_y), jnp.zeros((1, 2)),
                       jnp.ones((1, 2)), jnp.ones((1,)))
    got = np.asarray(preds)[0, :, :2]
    # bin argmax quantizes to 1/split_ratio = 0.5 px
    np.testing.assert_allclose(got, kps[:, :2], atol=0.5)
    # scores ~1 for ideal sharp distributions
    assert np.all(np.asarray(preds)[0, :, 2] > 0.5)
    assert boxes.shape == (1, 6)


def test_decoder_original_frame_matches_heatmap_formula():
    """to_original mapping == the heatmap decoder's with hw = input size."""
    dec = mp.create_decoder("simcc", input_size=[48, 64], split_ratio=2.0,
                            to_original=True)
    logits_x = jnp.zeros((1, 1, 96)).at[0, 0, 48].set(50.0)
    logits_y = jnp.zeros((1, 1, 128)).at[0, 0, 64].set(50.0)
    center = jnp.asarray([[100.0, 200.0]])
    scale = jnp.asarray([[0.6, 0.8]])
    preds, _ = dec((logits_x, logits_y), center, scale, jnp.ones((1,)))
    # bin 48/ratio=24 px -> x = 24 * (0.6*200/48) + 100 - 0.6*200/2 = 100
    # bin 64/ratio=32 px -> y = 32 * (0.8*200/64) + 200 - 0.8*200/2 = 200
    np.testing.assert_allclose(np.asarray(preds)[0, 0, :2], [100.0, 200.0],
                               rtol=1e-5)


def test_kl_loss_masks_and_learns():
    loss_fn = mp.create_loss("kl_discret", use_target_weight=True)
    rng = np.random.RandomState(0)
    target = np.zeros((2, 3, 96 + 128), np.float32)
    for n in range(2):
        for k in range(3):
            target[n, k, rng.randint(96)] = 1.0
            target[n, k, 96 + rng.randint(128)] = 1.0
    weight = np.ones((2, 3), np.float32)

    def value(logits):
        return loss_fn((logits[..., :96], logits[..., 96:]),
                       jnp.asarray(target), jnp.asarray(weight))

    logits0 = jnp.zeros((2, 3, 96 + 128))
    l0 = float(value(logits0))
    # a gradient step reduces the loss
    g = jax.grad(lambda z: value(z))(logits0)
    l1 = float(value(logits0 - 10.0 * g))
    assert l1 < l0
    # masked joints contribute nothing
    weight0 = weight.copy()
    weight0[:, 1] = 0.0
    l_masked = float(loss_fn(
        (logits0[..., :96], logits0[..., 96:]), jnp.asarray(target),
        jnp.asarray(weight0)))
    assert l_masked < l0


def test_tiny_train_loss_decreases():
    import optax

    from mindpose_tpu.parallel import build_train_step, create_train_state

    net = _net()
    loss = mp.create_loss("kl_discret", use_target_weight=True)
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)),
                         train=False)
    tx = mp.create_optimizer(variables["params"], "adamw", learning_rate=1e-3)
    state = create_train_state(variables, tx)
    step = build_train_step(nwl, tx, donate=False)

    t = TopDownGenerateSimCCTarget(config=SETTING, sigma=2.0, split_ratio=2.0)
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


def test_simcc_flip_tta_alignment():
    """The bin-mirror + (ratio-1)-bin realignment recovers the unflipped
    peak exactly: a stub net returns ideal labels for the original keypoints
    on the original image and for the fliplr'd keypoints on the mirror."""
    from mindpose_tpu.data.transform.utils import fliplr_joints
    from mindpose_tpu.engine.inferencer.simcc_inferencer import SimCCInferencer

    W, H, ratio = 48, 64, 2.0
    t = TopDownGenerateSimCCTarget(config=SETTING, sigma=2.0, split_ratio=ratio)
    kps = np.array([[10.0, 20.0, 2.0], [33.5, 47.0, 2.0], [5.0, 60.0, 2.0]],
                   np.float32)
    flipped_kps = fliplr_joints(kps, W, flip_index=[0, 2, 1])

    def to_logits(target):
        bx = int(W * ratio)
        return (jnp.log(jnp.asarray(target[None, :, :bx]) + 1e-12),
                jnp.log(jnp.asarray(target[None, :, bx:]) + 1e-12))

    lo = to_logits(t.transform({"keypoints": kps})["target"])
    lf = to_logits(t.transform({"keypoints": flipped_kps})["target"])

    decoder = mp.create_decoder("simcc", input_size=[W, H],
                                split_ratio=ratio, sigma=2.0,
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

    inferencer = SimCCInferencer(
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
    # exact agreement with the single-view decode of the original labels
    solo, _ = decoder(lo, jnp.zeros((1, 2)), jnp.ones((1, 2)),
                      jnp.ones((1,)))
    np.testing.assert_allclose(got, np.asarray(solo)[0, :, :2], atol=1e-6)
    np.testing.assert_allclose(got, kps[:, :2], atol=0.5)


def test_simcc_device_encode_matches_host():
    """ops/target.generate_simcc_targets == the host transform, batched."""
    from mindpose_tpu.ops.target import generate_simcc_targets

    t = TopDownGenerateSimCCTarget(config=SETTING, sigma=2.0, split_ratio=2.0)
    rng = np.random.RandomState(3)
    kps = np.concatenate(
        [rng.uniform(-10, 58, (6, 3, 1)),     # some x outside [0, 48)
         rng.uniform(-10, 74, (6, 3, 1)),     # some y outside [0, 64)
         rng.choice([0.0, 1.0, 2.0], (6, 3, 1))], axis=-1).astype(np.float32)

    host_t = np.stack(
        [t.transform({"keypoints": k})["target"] for k in kps])
    host_w = np.stack(
        [t.transform({"keypoints": k})["target_weight"] for k in kps])
    dev_t, dev_w = generate_simcc_targets(
        jnp.asarray(kps), input_size=(48, 64), split_ratio=2.0, sigma=2.0)
    np.testing.assert_array_equal(np.asarray(dev_w), host_w)
    np.testing.assert_allclose(np.asarray(dev_t), host_t, atol=1e-6)

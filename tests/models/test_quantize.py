"""Int8 weight-only quantization: round trip, tree hygiene, forward parity."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import mindpose_tpu as mp
from mindpose_tpu.models.networks import Net
from mindpose_tpu.models.quantize import (

    dequantize_variables,
    quantize_variables,
    quantized_bytes,
    quantized_eval_apply,
)
import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


class SmallBackbone(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Conv(32, (3, 3), strides=(4, 4), padding="SAME",
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME",
                    name="conv2")(x)
        return nn.relu(x)


def _net():
    head = mp.create_head("rle_head", in_channels=64, num_joints=5)
    return Net(backbone=SmallBackbone(), head=head)


def test_round_trip_error_bounded():
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 16, 32).astype(np.float32)
    # scale channels very differently: per-channel scales must absorb it
    w *= np.logspace(-2, 1, 32, dtype=np.float32)
    tree = {"params": {"conv": {"kernel": jnp.asarray(w)}}}
    q = quantize_variables(tree)
    back = np.asarray(dequantize_variables(q)["params"]["conv"]["kernel"])
    # max error per channel is half a quantization step = absmax/127/2
    absmax = np.max(np.abs(w), axis=(0, 1, 2))
    err = np.max(np.abs(back - w), axis=(0, 1, 2))
    assert np.all(err <= absmax / 127.0 * 0.5 + 1e-7)


def test_tree_hygiene():
    net = _net()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)),
                         train=False)
    q = quantize_variables(variables)
    # BN params/stats and biases stay float and identical
    np.testing.assert_array_equal(
        np.asarray(q["params"]["backbone"]["bn1"]["scale"]),
        np.asarray(variables["params"]["backbone"]["bn1"]["scale"]))
    np.testing.assert_array_equal(
        np.asarray(q["batch_stats"]["backbone"]["bn1"]["mean"]),
        np.asarray(variables["batch_stats"]["backbone"]["bn1"]["mean"]))
    assert q["params"]["backbone"]["conv1"]["bias"].dtype == jnp.float32
    # large kernels become {"q": int8, "scale": f32}
    qk = q["params"]["backbone"]["conv2"]["kernel"]
    assert set(qk.keys()) == {"q", "scale"}
    assert qk["q"].dtype == jnp.int8
    assert qk["scale"].shape[-1] == 64
    qb, fb = quantized_bytes(q)
    assert 0 < qb < fb


def test_forward_parity_and_predictor():
    net = _net()
    variables = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 48, 3)),
                         train=False)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 64, 48, 3), jnp.float32)
    mu_f, sig_f = net.apply(variables, x, train=False)

    decoder = mp.create_decoder("regression", input_size=[48, 64],
                                to_original=False)
    eval_net = mp.create_eval_network(net, decoder, output_raw=False)
    qvars = quantize_variables(variables)
    qfwd = quantized_eval_apply(eval_net, qvars)
    preds_q, _ = qfwd(x, jnp.zeros((2, 2)), jnp.ones((2, 2)), jnp.ones((2,)))
    preds_f, _ = eval_net.apply(variables, x, jnp.zeros((2, 2)),
                                jnp.ones((2, 2)), jnp.ones((2,)))
    # int8 weight rounding moves random-init predictions only slightly;
    # preds are in crop-pixel units (48x64), so ~3 px = ~6% of the crop
    np.testing.assert_allclose(np.asarray(preds_q), np.asarray(preds_f),
                               atol=3.0)
    assert not np.allclose(np.asarray(preds_q), np.asarray(preds_f))


def test_predictor_quantize_flag():
    from mindpose_tpu.engine.predictor import TopDownPredictor

    setting = {
        "image_size": [48, 64],
        "heatmap_size": [12, 16],
        "pixel_std": 200.0,
        "scale_padding": 1.25,
        "flip_pairs": [[1, 2]],
    }
    net = _net()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)),
                         train=False)
    image = np.random.RandomState(0).randint(0, 255, (120, 160, 3), np.uint8)
    boxes = np.array([[10.0, 10.0, 60.0, 90.0]], np.float32)
    kwargs = dict(dataset_setting=setting,
                  decoder_setting={"input_size": [48, 64]},
                  decoder_name="regression", batch_size=1)
    pf = TopDownPredictor(net, variables, **kwargs)
    pq = TopDownPredictor(net, variables, quantize="int8", **kwargs)
    out_f = pf(image, boxes)
    out_q = pq(image, boxes)
    assert out_q.shape == (1, 5, 3)
    np.testing.assert_allclose(out_q[..., :2], out_f[..., :2], atol=1.0)

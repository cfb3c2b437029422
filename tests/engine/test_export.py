"""Serving export round-trip: EvalNet -> StableHLO bytes -> call == direct.

Covers mindpose_tpu/engine/export.py: weights baked in as constants,
symbolic batch dimension (one artifact serves any batch size), and the
fused forward+decode graph surviving serialization.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import mindpose_tpu as mp
from mindpose_tpu.engine import export_eval_net, load_serving_fn
from mindpose_tpu.models.networks import Net
import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow



class _TinyBackbone(nn.Module):
    out_channels: int = 8

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Conv(8, (3, 3), strides=(4, 4), padding="SAME")(x)
        return nn.relu(x)


def _build(decoder_kwargs=None):
    head = mp.create_head("hrnet_head", in_channels=8, num_joints=3)
    net = Net(backbone=_TinyBackbone(), head=head)
    decoder = mp.create_decoder("topdown_heatmap", **(decoder_kwargs or {}))
    eval_net = mp.create_eval_network(net, decoder, output_raw=False)
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 24, 3), jnp.float32),
        train=False)
    return eval_net, variables


def _inputs(n, seed=0):
    rng = np.random.RandomState(seed)
    image = rng.rand(n, 32, 24, 3).astype(np.float32)
    center = rng.uniform(50, 100, (n, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, (n, 2)).astype(np.float32)
    score = rng.rand(n).astype(np.float32)
    return image, center, scale, score


def test_export_round_trip_symbolic_batch():
    eval_net, variables = _build()
    blob = export_eval_net(eval_net, variables, image_hw=(32, 24))
    assert isinstance(blob, bytes) and len(blob) > 0
    serve = load_serving_fn(blob)
    # one artifact, multiple batch sizes
    for n in (2, 5):
        inputs = _inputs(n, seed=n)
        got_preds, got_boxes = serve(*inputs)
        want_preds, want_boxes = eval_net.apply(variables, *inputs)
        np.testing.assert_allclose(
            np.asarray(got_preds), np.asarray(want_preds), rtol=1e-4,
            atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got_boxes), np.asarray(want_boxes), rtol=1e-4,
            atol=1e-4)


def test_export_static_batch_and_udp_decoder():
    eval_net, variables = _build(
        {"use_udp": True, "dark_udp_refine": True, "kernel_size": 3})
    blob = export_eval_net(eval_net, variables, image_hw=(32, 24), batch=3)
    serve = load_serving_fn(blob)
    inputs = _inputs(3, seed=7)
    got = serve(*inputs)
    want = eval_net.apply(variables, *inputs)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)


def test_export_cli(tmp_path):
    """tools/export.py end to end: recipe + checkpoint -> artifact + selftest.

    Uses the shipped ViTPose-S recipe (the smallest real model) with a
    freshly-initialized checkpoint; --selftest makes the CLI itself assert
    artifact-vs-direct-apply agreement.
    """
    import os
    import subprocess
    import sys

    from flax import serialization

    import mindpose_tpu as mp

    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    net = mp.create_network(
        "vit_s", "simple_baseline_head", num_joints=17,
        head_args={"num_deconv_layers": 2, "num_deconv_filters": (256, 256),
                   "num_deconv_kernels": (4, 4)})
    variables = jax.device_get(net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3), jnp.float32),
        train=False))
    ckpt = str(tmp_path / "vit_s.ckpt")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(variables))

    out = str(tmp_path / "vit_s.stablehlo")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "export.py"),
         "--config", os.path.join(repo, "configs", "vitpose",
                                  "vitpose_s_tpu.yaml"),
         "--ckpt", ckpt, "--out", out, "--platforms", "cpu",
         "--batch", "2", "--selftest"],
        capture_output=True, text=True, env=env, timeout=1800)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    assert os.path.getsize(out) > 1e6  # weights baked in
    assert "selftest ok" in (r.stdout + r.stderr)

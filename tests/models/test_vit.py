"""ViT backbone (ViTPose stretch family, models/backbones/vit.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mindpose_tpu as mp

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow



def _count(tree):
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def test_vit_s_forward_shape_and_params():
    net = mp.models.model_factory.create_backbone("vit_s", dtype=jnp.float32)
    x = jnp.zeros((2, 64, 48, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(v, x, train=False)
    # stride = patch_size 16
    assert out.shape == (2, 4, 3, 384)
    n = _count(v["params"])
    # ViT-S/16 trunk ~21-22M + pos embedding for this token grid
    assert 20e6 < n < 23e6, n
    assert net.out_channels == 384


def test_vit_l_param_count():
    # eval_shape: parameter accounting without paying 304M-param init
    net = mp.models.model_factory.create_backbone("vit_l", dtype=jnp.float32)
    v = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 256, 192, 3), jnp.float32),
                         train=False))
    n = _count(v["params"])
    # ViT-L/16 trunk: 303.3M (ViTPose-L backbone)
    assert 300e6 < n < 306e6, n
    assert net.out_channels == 1024


def test_vit_h_param_count():
    net = mp.models.model_factory.create_backbone("vit_h", dtype=jnp.float32)
    v = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 256, 192, 3), jnp.float32),
                         train=False))
    n = _count(v["params"])
    # ViT-Huge/16 trunk: ~632M (ViTPose-H backbone)
    assert 625e6 < n < 640e6, n
    assert net.out_channels == 1280


def test_vitpose_network_composes_with_simple_baseline_head():
    net = mp.create_network("vit_s", "simple_baseline_head", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(v, x, train=False)
    # 3 deconvs upsample stride-16 tokens (4x3) -> 32x24 heatmaps
    assert out.shape == (1, 32, 24, 17)


def test_vit_position_embedding_grid_tracks_resolution():
    """Pos embedding is stored as a (1, gh, gw, c) grid bound to the init
    resolution — the grid shape is what load-time interpolation keys on."""
    net = mp.models.model_factory.create_backbone("vit_s", dtype=jnp.float32)
    v64 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)), train=False)
    v128 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 48, 3)), train=False)
    s64 = v64["params"]["pos_embedding"].shape
    s128 = v128["params"]["pos_embedding"].shape
    assert s64 == (1, 4, 3, 384) and s128 == (1, 8, 3, 384)


def test_vit_pos_embedding_interpolates_on_load(tmp_path):
    """A checkpoint trained at one resolution loads at another: the pos grid
    is bilinearly resized (utils/checkpoint.py), every other tensor copied."""
    from flax import serialization

    from mindpose_tpu.utils.checkpoint import load_pretrained_backbone

    net = mp.create_network("vit_s", "simple_baseline_head", dtype=jnp.float32)
    v_small = jax.device_get(
        net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)), train=False))
    path = str(tmp_path / "vit_small_res.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(jax.device_get(v_small)))

    v_big = jax.device_get(
        net.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 48, 3)), train=False))
    loaded = load_pretrained_backbone(path, v_big)

    pos = loaded["params"]["backbone"]["pos_embedding"]
    assert pos.shape == (1, 8, 3, 384)
    src = np.asarray(v_small["params"]["backbone"]["pos_embedding"],
                     np.float32)
    ref = np.asarray(jax.image.resize(src, (1, 8, 3, 384), "bilinear"))
    np.testing.assert_allclose(np.asarray(pos), ref, atol=1e-6)
    # non-pos tensors are straight copies
    np.testing.assert_array_equal(
        loaded["params"]["backbone"]["patch_embed"]["kernel"],
        v_small["params"]["backbone"]["patch_embed"]["kernel"])
    # and the interpolated tree runs at the new resolution
    out = net.apply(loaded, jnp.zeros((1, 128, 48, 3)), train=False)
    assert np.all(np.isfinite(np.asarray(out)))


def test_vit_train_step_decreases_loss():
    net = mp.create_network("vit_s", "simple_baseline_head", dtype=jnp.float32)
    loss = mp.create_loss("joint_mse", use_target_weight=True)
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    from mindpose_tpu.optim import create_optimizer
    from mindpose_tpu.parallel import build_train_step, create_train_state

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 48, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(2, 32, 24, 17).astype(np.float32) * 0.1)
    w = jnp.ones((2, 17), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x[:1], train=False)
    tx = create_optimizer(v["params"], "adamw", learning_rate=1e-3)
    state = create_train_state(v, tx)
    step = build_train_step(nwl, tx, mesh=None)
    losses = []
    for _ in range(8):
        state, lv = step(state, x, y, w)
        losses.append(float(np.asarray(lv)[0]))
    assert losses[-1] < losses[0]

"""ViT backbone (ViTPose stretch family, models/backbones/vit.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mindpose_tpu as mp


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


def test_vitpose_network_composes_with_simple_baseline_head():
    net = mp.create_network("vit_s", "simple_baseline_head", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(v, x, train=False)
    # 3 deconvs upsample stride-16 tokens (4x3) -> 32x24 heatmaps
    assert out.shape == (1, 32, 24, 17)


def test_vit_position_embedding_is_resolution_locked():
    """Different input resolution -> different pos-embedding shape: init must
    bind to the train resolution (documented ViTPose behavior)."""
    net = mp.models.model_factory.create_backbone("vit_s", dtype=jnp.float32)
    v64 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)), train=False)
    v128 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 48, 3)), train=False)
    s64 = v64["params"]["pos_embedding"].shape
    s128 = v128["params"]["pos_embedding"].shape
    assert s64 == (1, 12, 384) and s128 == (1, 24, 384)


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

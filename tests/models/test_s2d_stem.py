"""Exact-equivalence tests for the space-to-depth HRNet stem (s2d.py).

The s2d stem must be a pure compute-schedule change: identical parameter
pytree, identical outputs (to float tolerance), identical batch-stat updates.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mindpose_tpu.models.backbones.hrnet import HRNet, _freeze_cfg, _w_cfg
from mindpose_tpu.models.backbones.s2d import (

    scatter_stem_conv1,
    scatter_stem_conv2,
    space_to_depth,
)

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


def _nets():
    cfg = _freeze_cfg(_w_cfg(32))
    return (
        HRNet(stage_cfg=cfg, dtype=jnp.float32),
        HRNet(stage_cfg=cfg, dtype=jnp.float32, stem_s2d=True),
    )


def test_param_pytree_identical():
    vanilla, s2d = _nets()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v0 = vanilla.init(jax.random.PRNGKey(0), x, train=False)
    v1 = s2d.init(jax.random.PRNGKey(0), x, train=False)
    p0 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v0)
    p1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v1)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert p0 == p1


def test_stem_equivalence_eval_and_train():
    """Stem-level equivalence with shared parameters.

    (Whole-net output comparison is meaningless here: a ~1e-7 float
    reassociation difference at the stem amplifies chaotically through ~70
    random conv layers. The stem is the only changed computation, so it is
    what must match.)
    """
    import flax.linen as nn
    from jax import lax

    from mindpose_tpu.models.backbones.s2d import s2d_stem_apply
    from mindpose_tpu.models.common import batch_norm, conv3x3

    dt = jnp.float32

    class VanillaStem(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = conv3x3(64, 2, dt, name="stem_conv1")(x)
            x = batch_norm(train, dt, name="stem_bn1")(x)
            x = nn.relu(x)
            x = conv3x3(64, 2, dt, name="stem_conv2")(x)
            x = batch_norm(train, dt, name="stem_bn2")(x)
            return nn.relu(x)

    class S2DStem(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return s2d_stem_apply(x, train, dt, 3)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32))
    v, s = VanillaStem(), S2DStem()
    variables = v.init(jax.random.PRNGKey(1), x)

    y0 = v.apply(variables, x, train=False)
    y1 = s.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

    y0, m0 = v.apply(variables, x, train=True, mutable=["batch_stats"])
    y1, m1 = s.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)
    for l0, l1 in zip(
        jax.tree_util.tree_leaves(m0), jax.tree_util.tree_leaves(m1)
    ):
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-5)


def test_gradients_flow_to_original_kernels():
    _, s2d = _nets()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    variables = s2d.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        y = s2d.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=False,
        )
        return jnp.sum(y**2)

    g = jax.grad(loss)(variables["params"])
    g1 = np.asarray(g["stem_conv1"]["kernel"])
    g2 = np.asarray(g["stem_conv2"]["kernel"])
    assert g1.shape == (3, 3, 3, 64) and np.abs(g1).max() > 0
    assert g2.shape == (3, 3, 64, 64) and np.abs(g2).max() > 0


def test_scatter_kernels_raw_conv_equivalence():
    """Raw conv equivalence, independent of the module plumbing."""
    from jax import lax

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 24, 3).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))
    dims = ("NHWC", "HWIO", "NHWC")

    ref1 = lax.conv_general_dilated(
        x, w1, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dims
    )  # (2, 8, 12, 5)
    got1 = lax.conv_general_dilated(
        space_to_depth(x),
        scatter_stem_conv1(w1),
        (2, 2),
        ((1, 0), (1, 0)),
        dimension_numbers=dims,
    )  # (2, 4, 6, 20) in s2d form
    n, hs, ws_, cf = got1.shape
    got1 = got1.reshape(n, hs, ws_, 2, 2, cf // 4)
    got1 = got1.transpose(0, 1, 3, 2, 4, 5).reshape(n, hs * 2, ws_ * 2, cf // 4)
    np.testing.assert_allclose(np.asarray(ref1), np.asarray(got1), atol=1e-5)

    # conv2: input is a (2,16,24,7) map; s2d it, conv with scattered kernel
    y = jnp.asarray(rng.randn(2, 16, 24, 7).astype(np.float32))
    w2 = jnp.asarray(rng.randn(3, 3, 7, 6).astype(np.float32))
    ref2 = lax.conv_general_dilated(
        y, w2, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dims
    )  # (2, 8, 12, 6)
    got2 = lax.conv_general_dilated(
        space_to_depth(y),
        scatter_stem_conv2(w2),
        (1, 1),
        ((1, 0), (1, 0)),
        dimension_numbers=dims,
    )
    np.testing.assert_allclose(np.asarray(ref2), np.asarray(got2), atol=1e-5)


def test_backbone_factory_flag():
    import mindpose_tpu as mp

    bb = mp.create_backbone("hrnet_w32", stem_s2d=True)
    assert bb.stem_s2d is True

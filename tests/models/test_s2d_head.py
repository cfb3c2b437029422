"""s2d refinement stage of HigherHRNetHead (round-4 bottom-up campaign).

`s2d_refine` must be an exact rewrite: same parameter pytree, same math —
only the layout/schedule changes (the 2x-resolution C=32 chain becomes a
128-lane-dense chain at 1x; measured 2.2x on TPU, docs/performance.md).
Checks: scatter-kernel equivalences vs the ops they rewrite, forward parity
(train+eval), gradient parity, and pytree/checkpoint compatibility.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mindpose_tpu.models.backbones.resnet import BasicBlock
from mindpose_tpu.models.backbones.s2d import (
    S2DBasicBlock,
    depth_to_space,
    scatter_conv3x3_s1,
    scatter_deconv4x4_s2,
    space_to_depth,
)
from mindpose_tpu.models.heads.higher_hrnet_head import HigherHRNetHead

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


rng = np.random.RandomState(0)


def test_scatter_conv3x3_s1_equivalence():
    """conv3x3/s1 SAME == s2d -> scattered conv -> d2s, all shapes/values."""
    x = jnp.asarray(rng.randn(2, 8, 10, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = depth_to_space(jax.lax.conv_general_dilated(
        space_to_depth(x), scatter_conv3x3_s1(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_scatter_deconv4x4_s2_equivalence():
    """ConvTranspose(k4,s2,SAME) == scattered 2x2 conv emitting s2d."""
    x = jnp.asarray(rng.randn(2, 8, 10, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 5, 6).astype(np.float32))
    want = jax.lax.conv_transpose(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = depth_to_space(jax.lax.conv_general_dilated(
        x, scatter_deconv4x4_s2(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_s2d_basic_block_matches_plain():
    """S2DBasicBlock(s2d(x)) == s2d(BasicBlock(x)) with shared variables,
    train and eval mode, including identical running-stat updates."""
    x = jnp.asarray(rng.randn(3, 8, 8, 4).astype(np.float32))
    plain = BasicBlock(4)
    s2d = S2DBasicBlock(4)
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    v2 = s2d.init(jax.random.PRNGKey(0), space_to_depth(x), train=False)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(v2))
    for train in (True, False):
        kw = {"mutable": ["batch_stats"]} if train else {}
        want = plain.apply(v, x, train, **kw)
        got = s2d.apply(v, space_to_depth(x), train, **kw)
        if train:
            (want, mw), (got, mg) = want, got
            for a, b in zip(jax.tree_util.tree_leaves(mw),
                            jax.tree_util.tree_leaves(mg)):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(depth_to_space(got)),
                                   np.asarray(want), rtol=1e-5, atol=1e-5)


def _mk_heads():
    kw = dict(in_channels=8, num_joints=3, with_ae_loss=(True, False),
              num_deconv_filters=(8,), dtype=jnp.float32)
    return (HigherHRNetHead(s2d_refine=False, **kw),
            HigherHRNetHead(s2d_refine=True, **kw))


def test_head_pytree_checkpoint_compatible():
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    plain, s2d = _mk_heads()
    vp = plain.init(jax.random.PRNGKey(0), x, train=False)
    vs = s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(vp) ==
            jax.tree_util.tree_structure(vs))
    for a, b in zip(jax.tree_util.tree_leaves(vp),
                    jax.tree_util.tree_leaves(vs)):
        assert a.shape == b.shape


def test_head_forward_and_grad_parity():
    """Same variables -> same outputs (both levels) and same param grads."""
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    plain, s2d = _mk_heads()
    v = plain.init(jax.random.PRNGKey(1), x, train=False)

    for train in (False, True):
        kw = {"mutable": ["batch_stats"]} if train else {}
        op = plain.apply(v, x, train, **kw)
        os_ = s2d.apply(v, x, train, **kw)
        if train:
            op, os_ = op[0], os_[0]
        for a, b in zip(op, os_):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)

    def loss(mod, params):
        outs, _ = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, True,
            mutable=["batch_stats"])
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    gp = jax.grad(lambda p: loss(plain, p))(v["params"])
    gs = jax.grad(lambda p: loss(s2d, p))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_hrnet_branch0_s2d_parity():
    """Tiny 2-branch HRNet: branch0_s2d output == plain with shared vars."""
    from mindpose_tpu.models.backbones.hrnet import HRNet, _freeze_cfg

    cfg = {
        "stage1": {"num_modules": 1, "num_branches": 1, "block": "BOTTLENECK",
                   "num_blocks": (1,), "num_channels": (8,)},
        "stage2": {"num_modules": 1, "num_branches": 2, "block": "BASIC",
                   "num_blocks": (2, 2), "num_channels": (8, 16)},
        "stage3": {"num_modules": 1, "num_branches": 2, "block": "BASIC",
                   "num_blocks": (2, 2), "num_channels": (8, 16)},
        "stage4": {"num_modules": 1, "num_branches": 2, "block": "BASIC",
                   "num_blocks": (2, 2), "num_channels": (8, 16),
                   "multiscale_output": False},
    }
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    plain = HRNet(stage_cfg=_freeze_cfg(cfg))
    s2d = HRNet(stage_cfg=_freeze_cfg(cfg), branch0_s2d=True)
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    vs = s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(vs))
    for train in (False, True):
        kw = {"mutable": ["batch_stats"]} if train else {}
        want = plain.apply(v, x, train, **kw)
        got = s2d.apply(v, x, train, **kw)
        if train:
            want, got = want[0], got[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

"""Unit tests for SubsampledBatchNorm (models/common.py)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mindpose_tpu.models.common import SubsampledBatchNorm, batch_norm
import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow



def test_frac_one_is_plain_flax_bn():
    bn = batch_norm(train=True, stats_frac=1.0)
    assert isinstance(bn, nn.BatchNorm)
    bn = batch_norm(train=True, stats_frac=0.25)
    assert isinstance(bn, SubsampledBatchNorm)


def test_stats_from_leading_slice_and_running_update():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 4, 4, 3).astype(np.float32) * 2.0 + 1.0)
    bn = SubsampledBatchNorm(use_running_average=False, stats_frac=0.5)
    variables = bn.init(jax.random.PRNGKey(0), x)
    y, mutated = bn.apply(variables, x, mutable=["batch_stats"])

    xs = np.asarray(x)[:4].reshape(-1, 3)
    mean, var = xs.mean(0), xs.var(0)
    # normalization uses slice stats but applies to the WHOLE batch
    expect = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]), 0.1 * mean, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        0.9 * 1.0 + 0.1 * var,
        atol=1e-6,
    )


def test_eval_mode_uses_running_stats():
    x = jnp.ones((4, 2, 2, 3), jnp.float32) * 5.0
    bn = SubsampledBatchNorm(use_running_average=True, stats_frac=0.25)
    variables = {
        "params": {"scale": jnp.ones((3,)), "bias": jnp.zeros((3,))},
        "batch_stats": {"mean": jnp.full((3,), 5.0), "var": jnp.ones((3,))},
    }
    y = bn.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-3)


def test_variable_tree_matches_flax_bn():
    x = jnp.ones((4, 2, 2, 3), jnp.float32)
    sub = SubsampledBatchNorm(use_running_average=False, stats_frac=0.5)
    ref = nn.BatchNorm(use_running_average=False)
    v0 = sub.init(jax.random.PRNGKey(0), x)
    v1 = ref.init(jax.random.PRNGKey(0), x)
    s0 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v0)
    s1 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v1)
    assert s0 == s1


def test_hrnet_bn_frac_checkpoint_compatible():
    """Param/stat pytrees of frac<1 and exact models interchange."""
    from mindpose_tpu.models.backbones.hrnet import HRNet, _freeze_cfg, _w_cfg

    cfg = _freeze_cfg(_w_cfg(32))
    exact = HRNet(stage_cfg=cfg, dtype=jnp.float32)
    sub = HRNet(stage_cfg=cfg, dtype=jnp.float32, bn_stats_frac=0.25)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v0 = exact.init(jax.random.PRNGKey(0), x, train=False)
    v1 = sub.init(jax.random.PRNGKey(0), x, train=False)
    s0 = jax.tree_util.tree_map(lambda a: a.shape, v0)
    s1 = jax.tree_util.tree_map(lambda a: a.shape, v1)
    assert s0 == s1
    # eval-mode forward with shared variables is identical math
    y0 = exact.apply(v0, x, train=False)
    y1 = sub.apply(v0, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)

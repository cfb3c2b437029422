"""Frozen-gradient BatchNorm (models/common.py SubsampledBatchNorm.frozen_grad).

The TPU throughput knob `bn_grad_stats: "frozen"` must (a) keep the forward
pass and running-statistics updates bit-comparable to exact BN, (b) keep the
variable pytree checkpoint-compatible, and (c) actually stop gradients
through the batch mean/var (dropping BN backward's dmean/dvar reduction
passes — the documented -7.3 ms on the HRNet-W32 train step).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mindpose_tpu as mp
from mindpose_tpu.models.common import SubsampledBatchNorm, batch_norm

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow



def test_factory_dispatch():
    import flax.linen as nn

    assert isinstance(batch_norm(train=True), nn.BatchNorm)
    for mode in ("frozen", "frozen_var"):
        bn = batch_norm(train=True, grad_stats=mode)
        assert isinstance(bn, SubsampledBatchNorm) and bn.grad_stats == mode
    # name-compat: auto-naming must produce "BatchNorm_i" paths
    assert SubsampledBatchNorm.__name__ == "BatchNorm"


def test_mixed_bn_classes_share_name_counter():
    """nn.BatchNorm and SubsampledBatchNorm mixed in ONE parent scope.

    The __name__-adoption hack (common.py) makes flax auto-name both classes
    from the same "BatchNorm" counter. That is the contract checkpoints rely
    on: a mixed model must produce exactly the paths an all-exact model
    produces (BatchNorm_0, BatchNorm_1, ...) with no collision and no
    per-class counters (ADVICE r2: pin this so a flax behavior change or
    refactor surfaces here instead of as silent checkpoint mismatch).
    """
    import flax.linen as nn

    class Mixed(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.BatchNorm(use_running_average=False)(x)
            x = SubsampledBatchNorm(use_running_average=False, stats_frac=1.0)(x)
            x = nn.BatchNorm(use_running_average=False)(x)
            return x

    class AllExact(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(3):
                x = nn.BatchNorm(use_running_average=False)(x)
            return x

    x = jnp.ones((4, 3))
    v_mixed = Mixed().init(jax.random.PRNGKey(0), x)
    v_exact = AllExact().init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_mixed) == jax.tree_util.tree_structure(
        v_exact
    )
    assert set(v_mixed["params"].keys()) == {
        "BatchNorm_0", "BatchNorm_1", "BatchNorm_2",
    }
    # checkpoint interchange: exact-BN variables apply cleanly to the mixed
    # model and produce the same forward (stats_frac=1, grad_stats=exact)
    y_mixed = Mixed().apply(v_exact, x, mutable=["batch_stats"])[0]
    y_exact = AllExact().apply(v_exact, x, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(y_mixed), np.asarray(y_exact), atol=2e-5)


@pytest.mark.parametrize("mode", ["frozen", "frozen_var"])
def test_forward_and_running_stats_match_exact(mode):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 6, 5, 3).astype(np.float32) * 2.0 + 1.0)

    exact = batch_norm(train=True)
    frozen = batch_norm(train=True, grad_stats=mode)
    v_e = exact.init(jax.random.PRNGKey(0), x)
    v_f = frozen.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_e) == jax.tree_util.tree_structure(v_f)

    y_e, s_e = exact.apply(v_e, x, mutable=["batch_stats"])
    y_f, s_f = frozen.apply(v_f, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_f), atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(s_e["batch_stats"][k]),
            np.asarray(s_f["batch_stats"][k]),
            rtol=1e-5,
            atol=1e-6,
        )


def test_gradient_stops_at_batch_stats():
    """d(sum BN(x))/dx: exact BN mean-centers gradients to ~0; frozen BN
    passes gamma/sigma through — the stats terms must be absent."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 4).astype(np.float32))

    def grad_of(bn):
        v = bn.init(jax.random.PRNGKey(0), x)

        def loss(x):
            y, _ = bn.apply(v, x, mutable=["batch_stats"])
            return jnp.sum(y)

        return jax.grad(loss)(x)

    g_exact = grad_of(batch_norm(train=True))
    g_frozen = grad_of(batch_norm(train=True, grad_stats="frozen"))

    # exact: sum-loss grads vanish (centering); frozen: gamma/sigma(x) > 0
    assert float(jnp.abs(g_exact).max()) < 1e-4
    var = np.var(np.asarray(x), axis=0)
    expected = 1.0 / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(
        np.asarray(g_frozen), np.broadcast_to(expected, x.shape), rtol=1e-4
    )
    # frozen_var keeps the mean-centering term: sum-loss grads still vanish
    g_fv = grad_of(batch_norm(train=True, grad_stats="frozen_var"))
    assert float(jnp.abs(g_fv).max()) < 1e-4

    # a non-symmetric loss separates all three: frozen_var must drop only
    # the dvar term
    def grad_of_sq(bn):
        v = bn.init(jax.random.PRNGKey(0), x)

        def loss(x):
            y, _ = bn.apply(v, x, mutable=["batch_stats"])
            return jnp.sum(jnp.square(y) * jnp.arange(x.shape[0])[:, None])

        return np.asarray(jax.grad(loss)(x))

    ge = grad_of_sq(batch_norm(train=True))
    gv = grad_of_sq(batch_norm(train=True, grad_stats="frozen_var"))
    gf = grad_of_sq(batch_norm(train=True, grad_stats="frozen"))
    assert not np.allclose(ge, gv) and not np.allclose(gv, gf)


def test_eval_mode_identical():
    """use_running_average path ignores frozen_grad entirely."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 3, 3, 5).astype(np.float32))
    exact = batch_norm(train=False)
    frozen = batch_norm(train=False, grad_stats="frozen")
    v = exact.init(jax.random.PRNGKey(0), x)
    y_e = exact.apply(v, x)
    y_f = frozen.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_f), atol=2e-6)


def test_hrnet_checkpoint_interchange():
    """A frozen-grad HRNet consumes an exact-BN HRNet checkpoint verbatim."""
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    exact_net = mp.create_network("hrnet_w32", "hrnet_head", dtype=jnp.float32)
    frozen_net = mp.create_network(
        "hrnet_w32",
        "hrnet_head",
        dtype=jnp.float32,
        backbone_args={"bn_grad_stats": "frozen"},
        head_args={"bn_grad_stats": "frozen"},
    )
    v_e = exact_net.init(jax.random.PRNGKey(0), x, train=False)
    v_f = frozen_net.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v_e) == jax.tree_util.tree_structure(v_f)
    # run the frozen model with the exact model's variables
    out = frozen_net.apply(v_e, x, train=False)
    assert out.shape == (1, 16, 12, 17)


def test_simple_baseline_head_accepts_knob():
    net = mp.create_network(
        "resnet50",
        "simple_baseline_head",
        dtype=jnp.float32,
        backbone_args={"bn_grad_stats": "frozen"},
        head_args={"bn_grad_stats": "frozen"},
    )
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = net.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape[-1] == 17

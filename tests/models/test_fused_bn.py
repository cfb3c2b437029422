"""Fused custom-vjp exact BatchNorm (models/common.py FusedBatchNorm).

`bn_grad_stats: "fused"` must be EXACT BN — unlike the frozen knobs it
changes only the backward *implementation* (two reductions in one pass
instead of autodiff's dmean/dvar chains), never the semantics:

(a) forward + running-stat updates match nn.BatchNorm,
(b) backward matches jax.grad of the identical forward formula to float
    tolerance (and jax.grad of flax's nn.BatchNorm),
(c) a short training run is step-for-step equal to the exact-BN control,
(d) variable pytree stays checkpoint-compatible (BatchNorm_i paths).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mindpose_tpu.models.common import (

    FusedBatchNorm,
    _bn_train_apply,
    batch_norm,
    bn_train_fused,
)

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


def _mk(shape=(8, 6, 5, 7), seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape).astype(dtype))
    c = shape[-1]
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    return x, scale, bias


def test_factory_dispatch():
    bn = batch_norm(train=True, grad_stats="fused")
    assert isinstance(bn, FusedBatchNorm)
    assert FusedBatchNorm.__name__ == "BatchNorm"  # checkpoint path compat


def test_forward_matches_flax_batchnorm():
    import flax.linen as nn

    x, scale, bias = _mk()
    fused = FusedBatchNorm(use_running_average=False)
    exact = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = {"params": {"scale": scale, "bias": bias},
         "batch_stats": {"mean": jnp.zeros_like(bias), "var": jnp.ones_like(bias)}}
    y_f, m_f = fused.apply(v, x, mutable=["batch_stats"])
    y_e, m_e = exact.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_e), atol=2e-5)
    # running-stat EMA identical
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(m_f["batch_stats"][k]),
            np.asarray(m_e["batch_stats"][k]), rtol=1e-5, atol=1e-8)


def test_eval_mode_matches_flax():
    import flax.linen as nn

    x, scale, bias = _mk(seed=3)
    stats = {"mean": jnp.asarray(np.random.RandomState(1).randn(7).astype(np.float32)),
             "var": jnp.asarray(np.abs(np.random.RandomState(2).randn(7)).astype(np.float32) + 0.5)}
    v = {"params": {"scale": scale, "bias": bias}, "batch_stats": stats}
    y_f = FusedBatchNorm(use_running_average=True).apply(v, x)
    y_e = nn.BatchNorm(use_running_average=True, epsilon=1e-5).apply(v, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_e), atol=2e-5)


def test_backward_matches_autodiff_of_same_forward():
    """Hand-written VJP vs jax.grad of the literally identical forward."""
    x, scale, bias = _mk()

    def loss_fused(x, scale, bias):
        y, _, _ = bn_train_fused(x, scale, bias, 1e-5)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_auto(x, scale, bias):
        y = _bn_train_apply(x, scale, bias, 1e-5)[0]
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_a = jax.grad(loss_auto, argnums=(0, 1, 2))(x, scale, bias)
    for gf, ga, name in zip(g_f, g_a, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(ga, np.float32),
            atol=1e-5, rtol=1e-5, err_msg=name)


def test_backward_bf16_no_worse_than_autodiff():
    """In bf16, the fused rule accumulates its reductions in f32; autodiff of
    the bf16 forward accumulates dscale/dbias in bf16. Assert the fused
    backward is at least as close to the f32 ground truth as autodiff is
    (strictly closer for the reduction outputs on this size)."""
    x32, scale, bias = _mk(shape=(16, 12, 10, 7))
    x16 = x32.astype(jnp.bfloat16)

    def mk_loss(apply_fn, x):
        def lf(args):
            y = apply_fn(*args)
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))
        return lf

    fused_f = lambda x, s, b: bn_train_fused(x, s, b, 1e-5)[0]
    auto_f = lambda x, s, b: _bn_train_apply(x, s, b, 1e-5)[0]

    ref = jax.grad(mk_loss(auto_f, x32))((x32, scale, bias))
    g_f = jax.grad(mk_loss(fused_f, x16))((x16, scale, bias))
    g_a = jax.grad(mk_loss(auto_f, x16))((x16, scale, bias))

    names = ("dx", "dscale", "dbias")
    for name, gf, ga, r in zip(names, g_f, g_a, ref):
        ef = float(jnp.max(jnp.abs(gf.astype(jnp.float32) - r)))
        ea = float(jnp.max(jnp.abs(ga.astype(jnp.float32) - r)))
        assert ef <= ea + 1e-6, f"{name}: fused {ef} worse than autodiff {ea}"
    # dx (the elementwise path) stays within bf16 element precision
    ef_dx = float(jnp.max(jnp.abs(g_f[0].astype(jnp.float32) - ref[0])))
    assert ef_dx < 0.15


def test_backward_matches_flax_batchnorm_grad():
    import flax.linen as nn

    x, scale, bias = _mk(seed=7)
    v = {"params": {"scale": scale, "bias": bias},
         "batch_stats": {"mean": jnp.zeros_like(bias), "var": jnp.ones_like(bias)}}

    def loss(mod, x):
        y, _ = mod.apply(v, x, mutable=["batch_stats"])
        return jnp.sum(jnp.tanh(y)), None

    fused = FusedBatchNorm(use_running_average=False)
    exact = nn.BatchNorm(use_running_average=False, epsilon=1e-5)
    g_f = jax.grad(lambda x: loss(fused, x)[0])(x)
    g_e = jax.grad(lambda x: loss(exact, x)[0])(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_e), atol=1e-4, rtol=1e-4)


def test_mean_var_cotangent_path():
    """Gradients THROUGH the (mean, var) primal outputs are exact too."""
    x, scale, bias = _mk(seed=11)

    def f_fused(x):
        _, mean, var = bn_train_fused(x, scale, bias, 1e-5)
        return jnp.sum(mean * 2.0) + jnp.sum(var * 3.0)

    def f_auto(x):
        _, mean, var, _ = _bn_train_apply(x, scale, bias, 1e-5)
        return jnp.sum(mean * 2.0) + jnp.sum(var * 3.0)

    g_f = jax.grad(f_fused)(x)
    g_a = jax.grad(f_auto)(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_a), atol=1e-5, rtol=1e-5)


def test_training_control_matches_exact():
    """A short conv+BN training run: fused vs exact, step-for-step equal."""
    import flax.linen as nn
    import optax

    class Tiny(nn.Module):
        grad_stats: str = "exact"

        @nn.compact
        def __call__(self, x, train=True):
            x = nn.Conv(8, (3, 3), use_bias=False)(x)
            x = batch_norm(train, grad_stats=self.grad_stats)(x)
            x = jax.nn.relu(x)
            x = nn.Conv(4, (1, 1), use_bias=False)(x)
            x = batch_norm(train, grad_stats=self.grad_stats)(x)
            return x

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
    t = jnp.asarray(rng.randn(4, 8, 8, 4).astype(np.float32))

    def run(grad_stats):
        net = Tiny(grad_stats=grad_stats)
        v = net.init(jax.random.PRNGKey(0), x)
        tx = optax.adam(1e-2)
        opt = tx.init(v["params"])
        losses = []
        params, stats = v["params"], v["batch_stats"]
        for _ in range(5):
            def lf(p):
                y, m = net.apply({"params": p, "batch_stats": stats},
                                 x, mutable=["batch_stats"])
                return jnp.mean(jnp.square(y - t)), m["batch_stats"]
            (l, stats), g = jax.value_and_grad(lf, has_aux=True)(params)
            u, opt = tx.update(g, opt)
            params = optax.apply_updates(params, u)
            losses.append(float(l))
        return losses, params

    l_e, p_e = run("exact")
    l_f, p_f = run("fused")
    np.testing.assert_allclose(l_f, l_e, rtol=1e-5)
    for pe, pf in zip(jax.tree_util.tree_leaves(p_e), jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pe), atol=1e-5)


def test_pytree_checkpoint_compat():
    """Fused-BN model variables are drop-in for exact-BN model variables."""
    import flax.linen as nn

    class Two(nn.Module):
        fused: bool = False

        @nn.compact
        def __call__(self, x):
            for _ in range(2):
                if self.fused:
                    x = FusedBatchNorm(use_running_average=False)(x)
                else:
                    x = nn.BatchNorm(use_running_average=False)(x)
            return x

    x = jnp.ones((4, 3))
    v_f = Two(fused=True).init(jax.random.PRNGKey(0), x)
    v_e = Two(fused=False).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_f) == jax.tree_util.tree_structure(v_e)

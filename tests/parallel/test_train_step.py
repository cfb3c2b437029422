"""Data-parallel train step: 8-device mesh vs single device equivalence.

The reference has zero distributed tests (SURVEY.md §4); here the sharded
step is validated numerically: pmean-of-shard-grads == full-batch grad for a
mean-reduced loss, so DP and single-device training must produce identical
parameters.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import mindpose_tpu as mp
from mindpose_tpu.models.networks import Net
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.parallel import (

    build_train_step,
    create_mesh,
    create_train_state,
    shard_batch,
)
import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


class TinyBackbone(nn.Module):
    out_channels: int = 8
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


def _make_net(use_bn=True):
    head = mp.create_head("hrnet_head", in_channels=8, num_joints=3)
    return Net(backbone=TinyBackbone(use_bn=use_bn), head=head)


def _batch(n=16):
    rng = np.random.RandomState(0)
    return [
        rng.rand(n, 16, 16, 3).astype(np.float32),
        rng.rand(n, 8, 8, 3).astype(np.float32),
        np.ones((n, 3), np.float32),
    ]


def _run(mesh, steps=4, use_bn=True):
    net = _make_net(use_bn=use_bn)
    loss = mp.create_loss("joint_mse", use_target_weight=True)
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)
    tx = create_optimizer(variables["params"], "adamw", learning_rate=1e-2, weight_decay=0.01)
    state = create_train_state(variables, tx)
    step_fn = build_train_step(nwl, tx, mesh=mesh, donate=False)
    batch = shard_batch(_batch(), mesh)
    losses = []
    for _ in range(steps):
        state, lv = step_fn(state, *batch)
        losses.append(float(jnp.sum(lv)))
    return state, losses


def test_dp_matches_single_device():
    # without BN, pmean-of-shard-grads == full-batch grad exactly
    assert len(jax.devices()) == 8
    mesh = create_mesh()
    state_dp, losses_dp = _run(mesh, use_bn=False)
    state_1, losses_1 = _run(None, use_bn=False)
    np.testing.assert_allclose(losses_dp, losses_1, rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_dp.params),
        jax.tree_util.tree_leaves(state_1.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_dp_bn_stats_synced_and_close_to_full_batch():
    # with BN the normalization is per-shard (local BN, the reference's
    # semantics); running stats are pmean'd so replicas agree, and losses
    # should track the single-device run closely but not exactly
    mesh = create_mesh()
    state_dp, losses_dp = _run(mesh, use_bn=True)
    state_1, losses_1 = _run(None, use_bn=True)
    np.testing.assert_allclose(losses_dp, losses_1, rtol=5e-3)
    for leaf in jax.tree_util.tree_leaves(state_dp.batch_stats):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_loss_decreases():
    mesh = create_mesh()
    _, losses = _run(mesh, steps=6)
    assert losses[-1] < losses[0]


def test_weight_decay_mask():
    from mindpose_tpu.optim.optim_factory import decay_mask

    params = {
        "Conv_0": {"kernel": np.zeros(1), "bias": np.zeros(1)},
        "BatchNorm_0": {"scale": np.zeros(1), "bias": np.zeros(1)},
    }
    mask = decay_mask(params)
    assert mask["Conv_0"]["kernel"] is True
    assert mask["Conv_0"]["bias"] is False
    assert mask["BatchNorm_0"]["scale"] is False
    assert mask["BatchNorm_0"]["bias"] is False


def test_scheduler_values():
    from mindpose_tpu.scheduler import create_lr_scheduler

    s = create_lr_scheduler(
        "warmup_multi_step_decay",
        lr=1.0,
        total_epochs=10,
        steps_per_epoch=10,
        warmup=4,
        milestones=[5, 8],
    )
    np.testing.assert_allclose(float(s(0)), 0.0)
    np.testing.assert_allclose(float(s(2)), 0.5)
    np.testing.assert_allclose(float(s(10)), 1.0)
    np.testing.assert_allclose(float(s(45)), 0.1, rtol=1e-6)  # after epoch-5 decay
    np.testing.assert_allclose(float(s(75)), 0.01, rtol=1e-6)  # after epoch-8 decay

    c = create_lr_scheduler(
        "warmup_cosine_decay", lr=1.0, total_epochs=1, steps_per_epoch=100,
        warmup=0, min_lr=0.1,
    )
    np.testing.assert_allclose(float(c(0)), 1.0)
    np.testing.assert_allclose(float(c(50)), 0.55, rtol=1e-5)
    np.testing.assert_allclose(float(c(100)), 0.1, rtol=1e-5)


def test_ema_update_matches_closed_form():
    from mindpose_tpu.parallel import build_ema_update

    decay = 0.9
    update = build_ema_update(decay)
    params = {"w": jnp.full((4,), 2.0), "b": jnp.full((2,), -1.0)}
    ema = jax.tree.map(jnp.zeros_like, params)
    for n in range(1, 6):
        ema = update(ema, params)
        # constant params: ema_n = p * (1 - decay^n)
        expect = 2.0 * (1 - decay**n)
        np.testing.assert_allclose(np.asarray(ema["w"]), expect, rtol=1e-6)
    # dtype preserved
    assert ema["w"].dtype == params["w"].dtype


def test_dp_fused_bn_matches_exact_bn():
    """custom_vjp FusedBatchNorm under the shard_map DP step.

    SGD (not adam) on purpose: the fused backward is mathematically exact
    but not bitwise (different reduction association, ~1e-7 relative);
    adam's g/sqrt(v) normalization amplifies that to sign-level on
    near-zero-grad leaves, so SGD is the optimizer under which "exact
    backward" is testable as tight param equality. Direct grad parity vs
    autodiff is covered in tests/models/test_fused_bn.py; here the subject
    is the shard_map/pmean interaction.
    """
    from mindpose_tpu.models.common import batch_norm

    class BnBackbone(nn.Module):
        grad_stats: str = "exact"

        @nn.compact
        def __call__(self, x, train=True):
            x = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = batch_norm(train, grad_stats=self.grad_stats)(x)
            return nn.relu(x)

    def run(grad_stats):
        mesh = create_mesh()
        head = mp.create_head("hrnet_head", in_channels=8, num_joints=3)
        net = Net(backbone=BnBackbone(grad_stats=grad_stats), head=head)
        loss = mp.create_loss("joint_mse", use_target_weight=True)
        nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 16, 16, 3)), train=False)
        tx = create_optimizer(variables["params"], "sgd", learning_rate=1e-2)
        state = create_train_state(variables, tx)
        step_fn = build_train_step(nwl, tx, mesh=mesh, donate=False)
        batch = shard_batch(_batch(), mesh)
        for _ in range(3):
            state, lv = step_fn(state, *batch)
        return state, float(jnp.sum(lv))

    s_exact, l_exact = run("exact")
    s_fused, l_fused = run("fused")
    np.testing.assert_allclose(l_fused, l_exact, rtol=1e-5)
    # params: SGD deltas = lr * grad deltas -> reassociation-level only
    for a, b in zip(jax.tree_util.tree_leaves(s_exact.params),
                    jax.tree_util.tree_leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)
    # running stats depend on the forward only -> near-bitwise
    for a, b in zip(jax.tree_util.tree_leaves(s_exact.batch_stats),
                    jax.tree_util.tree_leaves(s_fused.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-7)

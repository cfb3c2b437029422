"""Gradient accumulation: sequential microbatches per optimizer step.

For a mean-reduced loss over equal microbatches, averaging the microbatch
gradients reproduces the full-batch gradient exactly, so accum_steps=k must
match accum_steps=1 bitwise-close for BatchNorm-free models — on a single
device, on the DP mesh, and through the FSDP step (the ViT-L/H HBM lever).
BatchNorm models normalize per microbatch instead (documented divergence,
same semantics as training at the smaller batch); only the statistics
threading is validated there.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mindpose_tpu as mp
from mindpose_tpu.models.networks import Net
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.parallel import (

    build_fsdp_train_step,
    build_train_step,
    create_mesh,
    create_train_state,
    fsdp_batch_spec,
    shard_batch,
    shard_train_state,
)

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow

MIN_SIZE = 4096


class TinyBackbone(nn.Module):
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


def _make_nwl(use_bn=False):
    head = mp.create_head("hrnet_head", in_channels=8, num_joints=3)
    net = Net(backbone=TinyBackbone(use_bn=use_bn), head=head)
    loss = mp.create_loss("joint_mse", use_target_weight=True)
    return net, mp.create_network_with_loss(net, loss, has_extra_inputs=True)


def _batch(n=16):
    rng = np.random.RandomState(7)
    return [
        rng.rand(n, 16, 16, 3).astype(np.float32),
        rng.rand(n, 8, 8, 3).astype(np.float32),
        np.ones((n, 3), np.float32),
    ]


def _run(mesh, accum_steps, steps=3, use_bn=False, optim="momentum"):
    net, nwl = _make_nwl(use_bn=use_bn)
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False
    )
    tx = create_optimizer(
        variables["params"], optim, learning_rate=1e-2, weight_decay=0.01
    )
    state = create_train_state(variables, tx)
    step_fn = build_train_step(
        nwl, tx, mesh=mesh, donate=False, accum_steps=accum_steps
    )
    batch = shard_batch(_batch(), mesh) if mesh is not None else _batch()
    losses = []
    for _ in range(steps):
        state, lv = step_fn(state, *batch)
        losses.append(float(jnp.sum(lv)))
    return state, losses


def _assert_trees_close(a, b, rtol=2e-4, atol=1e-6):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol
        )


def test_accum_matches_full_batch_single_device():
    state_1, losses_1 = _run(None, accum_steps=1)
    state_4, losses_4 = _run(None, accum_steps=4)
    np.testing.assert_allclose(losses_4, losses_1, rtol=2e-5)
    _assert_trees_close(state_4.params, state_1.params)


def test_accum_matches_full_batch_on_dp_mesh():
    assert len(jax.devices()) == 8
    mesh = create_mesh()
    state_dp, losses_dp = _run(mesh, accum_steps=2)
    state_1, losses_1 = _run(None, accum_steps=1)
    np.testing.assert_allclose(losses_dp, losses_1, rtol=2e-5)
    _assert_trees_close(state_dp.params, state_1.params)


def test_accum_bn_stats_thread_through_scan():
    # per-microbatch BN statistics: still trains, running stats stay finite
    # and move away from init (the scan threads them, not drops them)
    state, losses = _run(None, accum_steps=4, steps=5, use_bn=True)
    assert losses[-1] < losses[0]
    moved = False
    for leaf in jax.tree.leaves(state.batch_stats):
        arr = np.asarray(leaf)
        assert np.all(np.isfinite(arr))
        moved |= bool(np.any(arr != 0) and np.any(np.abs(arr - 1) > 1e-6))
    assert moved


def test_accum_indivisible_batch_raises():
    net, nwl = _make_nwl()
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False
    )
    tx = create_optimizer(variables["params"], "momentum", learning_rate=1e-2)
    state = create_train_state(variables, tx)
    step_fn = build_train_step(nwl, tx, donate=False, accum_steps=3)
    with pytest.raises(ValueError, match="not divisible"):
        step_fn(state, *_batch(16))


def test_fsdp_accum_matches_fsdp_plain():
    from tests.parallel.test_fsdp import _batch as vit_batch
    from tests.parallel.test_fsdp import _init_state, _tiny_vit_net

    net, nwl = _tiny_vit_net()
    state, tx = _init_state(net, nwl, optim="momentum")
    image, target, weight = vit_batch()
    mesh = create_mesh(data_parallel=1, model_parallel=8)

    def run(accum_steps):
        st = shard_train_state(state, mesh, min_size=MIN_SIZE)
        step = build_fsdp_train_step(
            nwl, tx, mesh=mesh, state=st, donate=False,
            min_size=MIN_SIZE, accum_steps=accum_steps,
        )
        batch = shard_batch(
            [image, target, weight], mesh, spec=fsdp_batch_spec()
        )
        for _ in range(3):
            st, loss = step(st, *batch)
        return st, loss

    st1, loss1 = run(1)
    st2, loss2 = run(2)
    np.testing.assert_allclose(
        np.asarray(loss2), np.asarray(loss1), rtol=1e-4, atol=1e-6
    )
    _assert_trees_close(st2.params, st1.params, rtol=2e-4, atol=2e-6)

"""FSDP (GSPMD param/opt-state sharding) on the virtual 8-device CPU mesh.

Validates the three claims parallel/fsdp.py makes:
- numerics: the FSDP step equals the single-device step (global-batch loss,
  global-batch BN stats) on pure-FSDP (1x8) and hybrid (2x4) meshes;
- sharding: large params AND their AdamW moments are genuinely partitioned
  over the model axis (per-device shards strictly smaller than the leaf);
- the shape rule: replicate scalars/small/indivisible leaves.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import mindpose_tpu as mp
from mindpose_tpu.models.backbones.vit import ViT
from mindpose_tpu.models.model_factory import create_head
from mindpose_tpu.models.networks import Net, NetWithLoss
from mindpose_tpu.parallel import (
    build_fsdp_train_step,
    build_train_step,
    create_mesh,
    create_train_state,
    fsdp_batch_spec,
    fsdp_state_shardings,
    replicate_sharded,
    shard_batch,
    shard_train_state,
)
from mindpose_tpu.parallel.fsdp import fsdp_spec
from mindpose_tpu.parallel.mesh import MODEL_AXIS

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


MIN_SIZE = 4096  # test-scale threshold so the tiny model's big leaves shard


def _tiny_vit_net():
    backbone = ViT(patch_size=8, hidden_dim=64, depth=2, num_heads=2)
    head = create_head(
        "simple_baseline_head",
        in_channels=64,
        num_joints=17,
        num_deconv_layers=2,
        num_deconv_filters=(32, 32),
        num_deconv_kernels=(4, 4),
    )
    net = Net(backbone=backbone, head=head)
    loss = mp.create_loss("joint_mse", use_target_weight=True)
    return net, NetWithLoss(net, loss, has_extra_inputs=True)


def _batch(n=8):
    rng = np.random.RandomState(3)
    image = rng.rand(n, 64, 64, 3).astype(np.float32)
    target = rng.rand(n, 32, 32, 17).astype(np.float32)
    weight = np.ones((n, 17), np.float32)
    return image, target, weight


def _init_state(net, nwl, optim="adamw"):
    image, _, _ = _batch()
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(image[:1]),
                         train=False)
    tx = mp.create_optimizer(variables["params"], name=optim,
                             learning_rate=1e-3, weight_decay=0.05)
    return create_train_state(variables, tx), tx


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_fsdp_step_matches_single_device(mesh_shape):
    # momentum-SGD for the strict check: AdamW's sqrt(nu)+eps normalization
    # turns reduction-order noise on near-zero grads into O(lr) update
    # differences, which says nothing about the sharding being wrong
    net, nwl = _tiny_vit_net()
    state, tx = _init_state(net, nwl, optim="momentum")
    image, target, weight = _batch()

    ref_step = build_train_step(nwl, tx, mesh=None, donate=False)
    ref_state = state
    for _ in range(3):
        ref_state, ref_loss = ref_step(
            ref_state, jnp.asarray(image), jnp.asarray(target),
            jnp.asarray(weight))

    mesh = create_mesh(data_parallel=mesh_shape[0],
                       model_parallel=mesh_shape[1])
    fsdp_state = shard_train_state(state, mesh, min_size=MIN_SIZE)
    step = build_fsdp_train_step(nwl, tx, mesh=mesh, state=fsdp_state,
                                 donate=False, min_size=MIN_SIZE)
    batch = shard_batch([image, target, weight], mesh, spec=fsdp_batch_spec())
    for _ in range(3):
        fsdp_state, fsdp_loss = step(fsdp_state, *batch)

    np.testing.assert_allclose(np.asarray(ref_loss), np.asarray(fsdp_loss),
                               rtol=1e-4, atol=1e-6)
    for ref_leaf, fsdp_leaf in zip(jax.tree.leaves(ref_state.params),
                                   jax.tree.leaves(fsdp_state.params)):
        np.testing.assert_allclose(np.asarray(ref_leaf),
                                   np.asarray(fsdp_leaf),
                                   rtol=2e-4, atol=2e-6)


def test_fsdp_params_and_moments_actually_sharded():
    net, nwl = _tiny_vit_net()
    state, tx = _init_state(net, nwl)
    mesh = create_mesh(data_parallel=1, model_parallel=8)
    fsdp_state = shard_train_state(state, mesh, min_size=MIN_SIZE)
    step = build_fsdp_train_step(nwl, tx, mesh=mesh, state=fsdp_state,
                                 donate=False, min_size=MIN_SIZE)
    image, target, weight = _batch()
    batch = shard_batch([image, target, weight], mesh, spec=fsdp_batch_spec())
    fsdp_state, loss = step(fsdp_state, *batch)
    assert np.isfinite(np.asarray(loss)).all()

    def sharded_leaves(tree):
        out = []
        for leaf in jax.tree.leaves(tree):
            if not isinstance(leaf, jax.Array) or leaf.ndim == 0:
                continue
            spec = leaf.sharding.spec
            if any(MODEL_AXIS in ((s,) if isinstance(s, str) else (s or ()))
                   for s in spec):
                out.append(leaf)
        return out

    big_params = sharded_leaves(fsdp_state.params)
    assert big_params, "no parameter leaf was sharded over the model axis"
    for leaf in big_params:
        shard = leaf.addressable_shards[0].data
        assert shard.size * 8 == leaf.size  # genuinely 1/8th per device

    # AdamW mu/nu mirror the params; the shape rule must shard them too
    big_moments = sharded_leaves(fsdp_state.opt_state)
    assert len(big_moments) >= 2 * len(big_params)

    # and the step must KEEP them sharded (out_shardings pin the layout)
    assert all(not leaf.sharding.is_fully_replicated for leaf in big_params)


def test_fsdp_spec_shape_rule():
    assert fsdp_spec((), 8) == P()
    assert fsdp_spec((17,), 8) == P()  # too small
    assert fsdp_spec((100_003,), 8) == P()  # big but indivisible (prime)
    # shards the largest divisible dim
    assert fsdp_spec((1024, 256), 8) == P(MODEL_AXIS, None)
    assert fsdp_spec((256, 1024), 8) == P(None, MODEL_AXIS)
    # ties break to the later dim
    assert fsdp_spec((512, 512), 8) == P(None, MODEL_AXIS)
    # largest dim indivisible -> falls through to next largest
    assert fsdp_spec((1023, 512), 8) == P(None, MODEL_AXIS)


def test_replicate_sharded_single_host_noop():
    mesh = create_mesh(data_parallel=1, model_parallel=8)
    x = jax.device_put(np.ones((64, 64), np.float32),
                       NamedSharding(mesh, P(MODEL_AXIS, None)))
    # single-process arrays are fully addressable -> passthrough untouched
    y = replicate_sharded({"w": x})["w"]
    assert y is x

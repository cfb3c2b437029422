"""Two-process CPU multi-host runner (launched by test_multihost.py).

Exercises the code paths that are dead in single-process tests:
- ``shard_batch``'s ``make_array_from_process_local_data`` branch;
- ``allreduce_mean``'s ``process_allgather`` branch;
- rank-0 gating via ``is_main_process``;
- the FSDP path end to end: ``shard_train_state`` onto a multi-process
  mesh, one ``build_fsdp_train_step`` step (cross-process all-gather /
  reduce-scatter), and ``replicate_sharded`` bringing the sharded params
  back to full per-process values (the multi-host checkpoint/eval path).

Usage: python multihost_runner.py <rank> <nprocs> <port>
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

rank, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from mindpose_tpu.parallel import (  # noqa: E402
    create_mesh,
    gather_records,
    init_distributed,
    is_main_process,
    shard_batch,
)
from mindpose_tpu.utils.misc import allreduce_mean  # noqa: E402


def main():
    got_rank, world = init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=rank,
    )
    assert got_rank == rank and world == nprocs, (got_rank, world)
    assert is_main_process() == (rank == 0)

    n_global = len(jax.devices())
    n_local = jax.local_device_count()
    assert n_global == 2 * nprocs and n_local == 2, (n_global, n_local)

    # --- allreduce_mean: mean of per-process values across processes ---
    reduced = allreduce_mean(np.array([float(rank + 1), 10.0 * (rank + 1)]))
    np.testing.assert_allclose(reduced, [1.5, 15.0])

    # --- shard_batch: each process contributes its local half of the batch
    mesh = create_mesh()  # 4 global devices, data axis = 4
    local = np.full((2, 3), float(rank), np.float32)  # 2 samples per process
    (global_arr,) = shard_batch([local], mesh)
    assert global_arr.shape == (4, 3), global_arr.shape

    # global mean over the batch dim must see both processes' contributions:
    # rows are [0, 0, 1, 1] -> mean 0.5
    total = jax.jit(lambda x: x.mean())(global_arr)
    np.testing.assert_allclose(np.asarray(total), 0.5)

    # per-shard contents: the two addressable shards of this process hold
    # this process's local rows
    for shard in global_arr.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data), float(rank))

    # --- gather_records: sharded-eval record merge across processes ---
    # records carry numpy payloads exactly like the inferencers' output
    local_records = [
        {
            "pred": np.full((17, 3), float(rank), np.float32),
            "score": np.float32(0.5 + rank),
            "bbox_id": rank * 10 + i,
        }
        for i in range(3)
    ]
    merged = gather_records(local_records)
    assert len(merged) == 3 * nprocs, merged
    assert sorted(r["bbox_id"] for r in merged) == [0, 1, 2, 10, 11, 12]
    preds = {r["bbox_id"]: np.asarray(r["pred"]) for r in merged}
    assert preds[0].shape == (17, 3) and float(preds[10][0, 0]) == 1.0

    _check_fsdp_multihost()

    print(f"MULTIHOST_OK rank={rank}")


def _check_fsdp_multihost():
    """shard_train_state -> one FSDP step -> replicate_sharded, 2 processes."""
    import jax.numpy as jnp

    import mindpose_tpu as mp
    from mindpose_tpu.models.backbones.vit import ViT
    from mindpose_tpu.models.model_factory import create_head
    from mindpose_tpu.models.networks import Net, NetWithLoss
    from mindpose_tpu.parallel import (
        build_fsdp_train_step,
        create_train_state,
        fsdp_batch_spec,
        replicate_sharded,
        shard_train_state,
    )
    from mindpose_tpu.parallel.mesh import MODEL_AXIS

    min_size = 4096  # tiny-model threshold so leaves actually shard
    mesh = create_mesh(data_parallel=2, model_parallel=2)

    backbone = ViT(patch_size=8, hidden_dim=64, depth=2, num_heads=2)
    head = create_head("simple_baseline_head", in_channels=64, num_joints=17,
                       num_deconv_layers=2, num_deconv_filters=(32, 32),
                       num_deconv_kernels=(4, 4))
    net = Net(backbone=backbone, head=head)
    nwl = NetWithLoss(net, mp.create_loss("joint_mse", use_target_weight=True),
                      has_extra_inputs=True)

    rng = np.random.RandomState(0)  # same seed: identical init on both ranks
    image = rng.rand(2, 64, 64, 3).astype(np.float32)  # local half of batch 4
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(image[:1]),
                         train=False)
    tx = mp.create_optimizer(variables["params"], name="adamw",
                             learning_rate=1e-3, weight_decay=0.05)
    state = shard_train_state(create_train_state(variables, tx), mesh,
                              min_size=min_size)
    sharded = [
        leaf for leaf in jax.tree_util.tree_leaves(state.params)
        if any(MODEL_AXIS in ((s,) if isinstance(s, str) else (s or ()))
               for s in getattr(leaf.sharding, "spec", ()))
    ]
    assert sharded, "no param leaf sharded over the model axis"
    assert not sharded[0].is_fully_addressable  # genuinely multi-process

    step_fn = build_fsdp_train_step(nwl, tx, mesh=mesh, state=state,
                                    min_size=min_size)
    batch = shard_batch(
        [image, rng.rand(2, 32, 32, 17).astype(np.float32),
         np.ones((2, 17), np.float32)],
        mesh, spec=fsdp_batch_spec())
    state, loss_vec = step_fn(state, *batch)
    loss = np.asarray(loss_vec)  # replicated output: fetchable per process
    assert np.isfinite(loss).all(), loss

    # checkpoint/eval path: resharding collective -> full values per process
    full = replicate_sharded(state.params)
    checksum = 0.0
    for leaf in jax.tree_util.tree_leaves(full):
        assert leaf.sharding.is_fully_replicated
        checksum += float(np.abs(np.asarray(leaf)).sum())
    # identical full values on every process: the cross-process mean of the
    # checksum must equal the local checksum
    np.testing.assert_allclose(
        allreduce_mean(np.array([checksum])), [checksum], rtol=1e-6)


if __name__ == "__main__":
    main()

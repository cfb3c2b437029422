"""Two-process CPU multi-host runner (launched by test_multihost.py).

Exercises the code paths that are dead in single-process tests:
- ``shard_batch``'s ``make_array_from_process_local_data`` branch;
- ``allreduce_mean``'s ``process_allgather`` branch;
- rank-0 gating via ``is_main_process``.

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

    print(f"MULTIHOST_OK rank={rank}")


if __name__ == "__main__":
    main()

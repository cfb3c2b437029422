"""Device mesh construction + distributed bootstrap.

TPU-native replacement for the reference's OpenMPI + HCCL stack
(/root/reference/tools/train.py:43-52, SURVEY.md §2.2): a
``jax.sharding.Mesh`` over the local/global device set with a ``data`` axis
(extensible to model axes), ``jax.distributed.initialize`` instead of
``mpirun``, and ``process_index() == 0`` for rank-0 gating. Collectives ride
ICI via XLA — no framework transport code.
"""
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed",
    "create_mesh",
    "data_sharding",
    "replicated_sharding",
    "local_device_count",
    "is_main_process",
    "gather_records",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX if requested; returns (rank, world_size).

    Single-process (one host, N local chips) needs no bootstrap — the mesh
    spans jax.devices() directly.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def create_mesh(
    devices: Optional[Sequence] = None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Mesh over (data, model) axes; model axis defaults to 1 (pure DP).

    CNN pose models at 256x192 fit easily on one chip, so DP is the load-
    bearing axis (the reference's only strategy); the model axis is kept in
    the mesh so tensor-parallel shardings can be layered on without changing
    the step code.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (
        f"mesh {data_parallel}x{model_parallel} != {n} devices"
    )
    arr = np.array(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_device_count() -> int:
    return jax.local_device_count()


def is_main_process() -> bool:
    """Rank-0 gating for eval/checkpoint/logging (ref eval_callback.py:99)."""
    return jax.process_index() == 0


def gather_records(records: list) -> list:
    """All-gather a list of records across processes.

    Enables sharded evaluation on multi-host meshes: each process infers its
    local shard of the val set, then every process sees the full record list
    (the evaluator can run redundantly or rank-0-gated). Single-process: a
    no-op. The payload rides the JAX collective fabric as padded uint8
    buffers (two allgathers: sizes, then data). Numpy arrays/scalars in the
    records are serialized through JSON and come back as nested lists /
    Python scalars — consumers should ``np.asarray`` what they index into.
    """
    if jax.process_count() == 1:
        return records
    import json

    from jax.experimental import multihost_utils

    def _default(o):
        # inference records carry numpy payloads (pred arrays, np scalars)
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, np.generic):
            return o.item()
        raise TypeError(f"not JSON serializable: {type(o)}")

    payload = np.frombuffer(
        json.dumps(records, default=_default).encode("utf-8"), np.uint8
    )
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64)
    ).ravel()
    buf = np.zeros(int(sizes.max()) if sizes.size else 0, np.uint8)
    buf[: payload.size] = payload
    gathered = multihost_utils.process_allgather(buf)  # [P, max_size]
    merged = []
    for size, row in zip(sizes, np.atleast_2d(gathered)):
        merged.extend(json.loads(bytes(row[: int(size)]).decode("utf-8")))
    return merged

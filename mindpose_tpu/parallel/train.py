"""The jitted, mesh-sharded train step.

TPU-native replacement for ``ms.Model.train(dataset_sink_mode=True)`` +
``parallel_mode="data_parallel", gradients_mean=True``
(/root/reference/tools/train.py:176-233): one ``shard_map`` over the mesh's
data axis runs the local forward/backward, then ``pmean``s gradients, loss
and BatchNorm statistics. BatchNorm normalizes with *local-shard* statistics
(matching the reference's non-sync BN training dynamics and avoiding a
collective per BN layer); only the running stats are averaged so replicas
stay bitwise consistent.

Multi-component losses (AE: [push, pull] / [mse, push, pull]) are summed for
the backward pass and returned per-component for logging, mirroring
MindSpore's all-ones sens gradient semantics.
"""
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.networks import NetWithLoss
from .mesh import DATA_AXIS

__all__ = [
    "TrainState",
    "create_train_state",
    "build_train_step",
    "shard_batch",
    "accum_loss_and_grads",
    "build_ema_update",
]


def build_ema_update(decay: float) -> Callable:
    """Jitted exponential moving average of the parameter pytree.

    ``ema = decay * ema + (1 - decay) * params`` per optimizer step —
    the standard weight-averaging lever for eval-time stability (not in
    the reference). Elementwise, so sharded (FSDP) params keep their
    layout; donating the previous EMA buffer makes it allocation-free.
    """

    @jax.jit
    def update(ema_params, params):
        return jax.tree.map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
            ema_params, params,
        )

    return update


def accum_loss_and_grads(
    net_with_loss: NetWithLoss,
    params: Any,
    batch_stats: Any,
    batch: Sequence[Any],
    accum_steps: int = 1,
    preprocess: Optional[Callable] = None,
):
    """Loss vector, new batch_stats and gradients — optionally accumulated.

    With ``accum_steps > 1`` the batch dim is split into that many
    microbatches and scanned sequentially at fixed ``params``, keeping one
    microbatch of activations live at a time (the HBM lever for ViT-L/H-scale
    training at large effective batch). Gradients are averaged across
    microbatches, so for BatchNorm-free models the result is bitwise the
    same objective as one step at the full batch; BatchNorm models instead
    compute batch statistics per microbatch (running stats thread through
    the scan) — the same semantics as training at the smaller batch.
    """

    def loss_fn(params, stats, mb):
        loss, new_stats = net_with_loss.apply(
            {"params": params, "batch_stats": stats}, *mb
        )
        return jnp.sum(loss), (jnp.atleast_1d(loss), new_stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    if accum_steps <= 1:
        mb = preprocess(*batch) if preprocess is not None else batch
        (_, (loss_vec, new_stats)), grads = grad_fn(params, batch_stats, mb)
        return loss_vec, new_stats, grads

    b = int(batch[0].shape[0])
    if b % accum_steps:
        raise ValueError(
            f"(local) batch size {b} is not divisible by "
            f"accum_steps={accum_steps}"
        )
    micro = [
        x.reshape((accum_steps, b // accum_steps) + tuple(x.shape[1:]))
        for x in batch
    ]

    def body(carry, mb):
        stats, grad_acc = carry
        mb = preprocess(*mb) if preprocess is not None else tuple(mb)
        (_, (loss_vec, new_stats)), grads = grad_fn(params, stats, mb)
        return (new_stats, jax.tree.map(jnp.add, grad_acc, grads)), loss_vec

    zeros = jax.tree.map(jnp.zeros_like, params)
    (new_stats, grads), losses = jax.lax.scan(body, (batch_stats, zeros), micro)
    grads = jax.tree.map(lambda g: g / accum_steps, grads)
    return jnp.mean(losses, axis=0), new_stats, grads


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    variables, tx: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


def build_train_step(
    net_with_loss: NetWithLoss,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    preprocess: Optional[Callable] = None,
    accum_steps: int = 1,
) -> Callable:
    """Returns ``train_step(state, *batch_arrays) -> (state, loss_vector)``.

    ``batch_arrays`` are the final data columns in order (data, label,
    *extra). With a mesh, the batch dim is sharded over the data axis and
    params/state are replicated; without one, it's a plain single-device jit.

    ``preprocess`` (optional) runs INSIDE the jitted/sharded step on the raw
    batch columns before the forward pass — the hook for the on-device input
    pipeline (normalize + Gaussian target rasterization, ops/image+target),
    fused by XLA into the step.

    ``accum_steps > 1`` splits each (local) batch into sequential
    microbatches with averaged gradients (one optimizer step per call —
    see accum_loss_and_grads for the BatchNorm-statistics caveat).
    """

    def local_step(state: TrainState, *batch):
        loss_vec, new_stats, grads = accum_loss_and_grads(
            net_with_loss, state.params, state.batch_stats, batch,
            accum_steps=accum_steps, preprocess=preprocess,
        )

        if mesh is not None:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss_vec = jax.lax.pmean(loss_vec, DATA_AXIS)
            new_stats = jax.lax.pmean(new_stats, DATA_AXIS)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss_vec

    if mesh is None:
        return jax.jit(local_step, donate_argnums=(0,) if donate else ())

    replicated = P()
    sharded = P(DATA_AXIS)

    def sharded_step(state, *batch):
        fn = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(replicated,) + (sharded,) * len(batch),
            out_specs=(replicated, replicated),
            check_vma=False,
        )
        return fn(state, *batch)

    return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())


def shard_batch(
    batch_arrays: Sequence[Any], mesh: Optional[Mesh], spec: Optional[P] = None
):
    """Host arrays -> batch-dim-sharded global device arrays.

    Single-host: a sharded device_put. Multi-host: each process contributes
    its local shard of the global batch (the loader already shards records by
    process), assembled with make_array_from_process_local_data. ``spec``
    overrides the batch partitioning (FSDP shards over both mesh axes).
    """
    if mesh is None:
        return [jax.device_put(x) for x in batch_arrays]
    sharding = NamedSharding(mesh, spec if spec is not None else P(DATA_AXIS))
    if jax.process_count() > 1:
        return [
            jax.make_array_from_process_local_data(sharding, x)
            for x in batch_arrays
        ]
    return [jax.device_put(x, sharding) for x in batch_arrays]

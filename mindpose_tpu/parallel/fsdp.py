"""FSDP: fully-sharded data parallel via GSPMD (ZeRO-3-style).

Beyond the reference (whose only strategy is data parallel, SURVEY.md §2.2):
the ViTPose-L/H backbones (304M/632M params) carry 1.2/2.5 GB of f32
parameters plus 2x that in AdamW moments — replicating the optimizer state
per chip wastes most of a TPU v5e's 16 GB HBM before activations. The
TPU-native answer is not a hand-rolled parameter server: shard every large
parameter (and, by the same shape rule, its optimizer moments) across the
mesh's ``model`` axis with PartitionSpec annotations and let XLA's SPMD
partitioner insert the all-gathers (params, forward + backward) and
reduce-scatters (grads) on ICI.

Contrast with ``parallel/train.py``'s shard_map step: that one computes
BatchNorm statistics per local shard (matching the reference's non-sync-BN
training dynamics). The FSDP step is a plain GSPMD jit over the global
batch, so batch statistics become GLOBAL-batch statistics (sync-BN
semantics). The models that need FSDP (ViT family) are LayerNorm-only, so
this is moot for them; for BN models at these sizes prefer
``parallel_mode: data``.

Loss/gradient semantics match the DP step exactly: the loss is a mean over
the global batch, so its gradient equals the pmean-of-local-grads the DP
path computes.
"""
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.networks import NetWithLoss
from .mesh import DATA_AXIS, MODEL_AXIS
from .train import TrainState

__all__ = [
    "fsdp_spec",
    "fsdp_state_shardings",
    "fsdp_batch_spec",
    "shard_train_state",
    "build_fsdp_train_step",
    "replicate_sharded",
]

# parameters below this many elements are replicated: sharding tiny biases /
# LayerNorm scales buys nothing and costs a collective each
_MIN_SHARD_SIZE = 2 ** 16


def fsdp_spec(
    shape: Sequence[int], axis_size: int, min_size: int = _MIN_SHARD_SIZE
) -> P:
    """Shape rule: shard the largest evenly-divisible dim over ``model``.

    Purely shape-based so the same rule assigns matching specs to a
    parameter and its AdamW moments (identical shapes). Scalars, small
    tensors and shapes with no dim divisible by the axis stay replicated.
    """
    shape = tuple(int(s) for s in shape)
    if not shape or math.prod(shape) < min_size:
        return P()
    for d in sorted(range(len(shape)), key=lambda i: (shape[i], i),
                    reverse=True):
        if shape[d] % axis_size == 0:
            spec = [None] * len(shape)
            spec[d] = MODEL_AXIS
            return P(*spec)
    return P()


def fsdp_state_shardings(
    state: Any, mesh: Mesh, min_size: int = _MIN_SHARD_SIZE
) -> Any:
    """Pytree of NamedShardings mirroring a TrainState (or any pytree).

    Works on concrete arrays or ShapeDtypeStructs; the shape rule covers
    params, the AdamW mu/nu mirrors, and replicates scalars (step, count)
    and batch_stats (small 1-D vectors) automatically.
    """
    axis_size = mesh.shape[MODEL_AXIS]

    def _sharding(x):
        return NamedSharding(mesh, fsdp_spec(x.shape, axis_size, min_size))

    return jax.tree.map(_sharding, state)


def fsdp_batch_spec() -> P:
    """Batch dim sharded over BOTH mesh axes: every chip holds params shards
    of the model but runs its own slice of the global batch (hybrid
    FSDP x DP when the data axis is > 1)."""
    return P((DATA_AXIS, MODEL_AXIS))


def shard_train_state(
    state: TrainState, mesh: Mesh, min_size: int = _MIN_SHARD_SIZE
) -> TrainState:
    """Place a host/replicated TrainState onto the mesh per the FSDP rule."""
    shardings = fsdp_state_shardings(state, mesh, min_size)
    return jax.tree.map(jax.device_put, state, shardings)


def replicate_sharded(tree: Any) -> Any:
    """Replicate mesh-sharded leaves so every process holds full values.

    Needed before rank-gated host work (checkpoint write, single-process
    eval) on a multi-host FSDP state: each leaf's full value lives spread
    across processes. This reshards on the leaf's own global mesh — a
    collective, so on multi-host meshes EVERY process must call it (before
    any rank gate). Fully-addressable leaves (single host) and already
    replicated leaves pass through untouched, making it a no-op for the
    DP path.
    """

    def _rep(x):
        if (
            isinstance(x, jax.Array)
            and not x.is_fully_addressable
            and not x.sharding.is_fully_replicated
        ):
            out = NamedSharding(x.sharding.mesh, P())
            return jax.jit(lambda a: a, out_shardings=out)(x)
        return x

    return jax.tree.map(_rep, tree)


def build_fsdp_train_step(
    net_with_loss: NetWithLoss,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    state: TrainState,
    preprocess: Optional[Callable] = None,
    donate: bool = True,
    min_size: int = _MIN_SHARD_SIZE,
    accum_steps: int = 1,
) -> Callable:
    """Returns ``train_step(state, *batch) -> (state, loss_vector)``.

    A single GSPMD jit: out_shardings pin the new state to the FSDP layout
    (params/moments stay resident as shards across steps — no re-gather
    between steps), a sharding constraint on the gradients marks the
    reduce-scatter point, and XLA places the parameter all-gathers where the
    forward/backward consume them. ``state`` is only read for leaf shapes.

    ``accum_steps > 1`` scans the global batch as sequential microbatches
    (see train.accum_loss_and_grads) — with FSDP this is THE lever for large
    effective batch at ViT-L/H scale: activations for one microbatch at a
    time, one all-gather/reduce-scatter pipeline per microbatch, one
    optimizer step per call.
    """
    from .train import accum_loss_and_grads

    state_shardings = fsdp_state_shardings(state, mesh, min_size)
    param_shardings = state_shardings.params
    loss_sharding = NamedSharding(mesh, P())

    def step(state: TrainState, *batch) -> Tuple[TrainState, jnp.ndarray]:
        loss_vec, new_stats, grads = accum_loss_and_grads(
            net_with_loss, state.params, state.batch_stats, batch,
            accum_steps=accum_steps, preprocess=preprocess,
        )
        grads = jax.lax.with_sharding_constraint(grads, param_shardings)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss_vec

    return jax.jit(
        step,
        out_shardings=(state_shardings, loss_sharding),
        donate_argnums=(0,) if donate else (),
    )

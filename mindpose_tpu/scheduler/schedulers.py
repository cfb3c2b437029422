"""Learning-rate schedules (optax-style step -> lr callables).

Parity: /root/reference/mindpose/scheduler/warmup_cosine_decay_lr.py:12-73 and
warmup_multi_step_decay_lr.py:11-77 — linear warmup from 0, cosine decay to
``min_lr``, and per-epoch milestone decay (applied at epoch boundary
``(milestone - 1) * steps_per_epoch`` like the reference's precomputed table).
Schedules are pure jnp functions usable inside the jitted train step.
"""
from typing import List, Union

import jax.numpy as jnp

from ..register import register

__all__ = ["warmup_cosine_decay", "warmup_multi_step_decay", "create_lr_scheduler"]


def _resolve_warmup(warmup: Union[int, float], total_steps: int) -> int:
    if isinstance(warmup, float) and not warmup.is_integer():
        steps = int(warmup * total_steps)
    else:
        steps = int(warmup)
    if steps > total_steps:
        raise ValueError("Warmup steps must be smaller than total steps")
    return steps


@register("lr_scheduler", extra_name="warmup_cosine_decay")
def warmup_cosine_decay(
    lr: float,
    total_epochs: int,
    steps_per_epoch: int,
    warmup: Union[int, float] = 0,
    min_lr: float = 0.0,
    **kwargs,
):
    total_steps = total_epochs * steps_per_epoch
    warmup_steps = _resolve_warmup(warmup, total_steps)
    decay_steps = max(total_steps - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        t = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        cos = min_lr + 0.5 * (lr - min_lr) * (1.0 + jnp.cos(jnp.pi * t))
        out = jnp.where(step < warmup_steps, warm, cos)
        return jnp.maximum(out, min_lr)

    return schedule


@register("lr_scheduler", extra_name="warmup_multi_step_decay")
def warmup_multi_step_decay(
    lr: float,
    total_epochs: int,
    steps_per_epoch: int,
    milestones: List[int],
    decay_rate: float = 0.1,
    warmup: Union[int, float] = 0,
    **kwargs,
):
    total_steps = total_epochs * steps_per_epoch
    warmup_steps = _resolve_warmup(warmup, total_steps)
    boundaries = jnp.asarray(
        [(m - 1) * steps_per_epoch for m in milestones], jnp.float32
    )

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        num_decays = jnp.sum(step >= boundaries)
        stepped = lr * (decay_rate ** num_decays.astype(jnp.float32))
        return jnp.where(step < warmup_steps, warm, stepped)

    return schedule


def create_lr_scheduler(
    name: str,
    lr: float,
    total_epochs: int,
    steps_per_epoch: int,
    warmup: Union[int, float] = 0,
    **kwargs,
):
    """Factory (parity: /root/reference/mindpose/scheduler/scheduler_factory.py:8)."""
    from ..register import entrypoint

    return entrypoint("lr_scheduler", name)(
        lr=lr,
        total_epochs=total_epochs,
        steps_per_epoch=steps_per_epoch,
        warmup=warmup,
        **kwargs,
    )

"""Optimizer factory on optax.

Parity: /root/reference/mindpose/optim/optim_factory.py — registered names
adam/sgd/momentum/adagrad/adamw, with the bias/BN-no-weight-decay grouping
(the reference filters params whose name contains beta/gamma/bias; in flax
that's BatchNorm ``scale``/``bias`` and conv/dense ``bias`` leaves).

``loss_scale`` is accepted for config parity but unused: bf16 training on TPU
needs no loss scaling.
"""
from typing import Any, Callable, Union

import jax
import optax

from ..register import entrypoint, register

__all__ = ["create_optimizer", "decay_mask"]


def decay_mask(params) -> Any:
    """True for leaves that should receive weight decay (conv/dense kernels)."""

    def is_decay(path, _):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return name not in ("bias", "scale")

    return jax.tree_util.tree_map_with_path(is_decay, params)


def _register_optimizers():
    @register("optim", extra_name="adam")
    def adam(learning_rate, weight_decay=0.0, mask=None, **kw):
        tx = optax.adam(learning_rate, **_filter(kw, ("b1", "b2", "eps")))
        return _with_decay(tx, weight_decay, mask)

    @register("optim", extra_name="sgd")
    def sgd(learning_rate, weight_decay=0.0, mask=None, **kw):
        tx = optax.sgd(learning_rate)
        return _with_decay(tx, weight_decay, mask)

    @register("optim", extra_name="momentum")
    def momentum(learning_rate, weight_decay=0.0, mask=None, momentum=0.9, **kw):
        tx = optax.sgd(learning_rate, momentum=momentum)
        return _with_decay(tx, weight_decay, mask)

    @register("optim", extra_name="adagrad")
    def adagrad(learning_rate, weight_decay=0.0, mask=None, **kw):
        tx = optax.adagrad(learning_rate)
        return _with_decay(tx, weight_decay, mask)

    @register("optim", extra_name="adamw")
    def adamw(learning_rate, weight_decay=0.0, mask=None, **kw):
        return optax.adamw(
            learning_rate,
            weight_decay=weight_decay,
            mask=mask,
            **_filter(kw, ("b1", "b2", "eps")),
        )


def _filter(kw, keys):
    return {k: v for k, v in kw.items() if k in keys}


def _with_decay(tx, weight_decay: float, mask):
    """Additive L2 decay (MindSpore-style) ahead of the optimizer update."""
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay, mask=mask), tx)
    return tx


_register_optimizers()


def create_optimizer(
    params: Any,
    name: str = "adam",
    learning_rate: Union[float, Callable] = 0.001,
    weight_decay: float = 0.0,
    filter_bias_and_bn: bool = True,
    loss_scale: float = 1.0,  # parity knob; no-op with bf16 on TPU
    **kwargs: Any,
) -> optax.GradientTransformation:
    """Create an optax optimizer over the model's parameter pytree."""
    mask = None
    if weight_decay and filter_bias_and_bn:
        mask = decay_mask(params)
    return entrypoint("optim", name)(
        learning_rate=learning_rate, weight_decay=weight_decay, mask=mask, **kwargs
    )

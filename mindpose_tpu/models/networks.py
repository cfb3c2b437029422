"""Network composition: Net / EvalNet / NetWithLoss.

Parity: /root/reference/mindpose/models/networks.py:15-106, functionally
re-designed: ``Net`` (backbone -> neck? -> head) is the single Flax module
owning the parameter tree; ``EvalNet`` and ``NetWithLoss`` are *pure
wrappers* over ``net.apply`` — they add no parameter scope, so one variable
collection serves training, evaluation and checkpointing.
"""
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Net(nn.Module):
    """backbone -> neck? -> head (ref networks.py:15-44)."""

    backbone: nn.Module
    head: nn.Module
    neck: Optional[nn.Module] = None

    def __call__(self, x: jnp.ndarray, train: bool = True) -> Any:
        x = self.backbone(x, train)
        if self.neck is not None:
            x = self.neck(x, train)
        return self.head(x, train)


class EvalNet:
    """Forward (eval mode) + on-device decode (ref networks.py:47-76).

    ``apply(variables, image, *decoder_inputs)`` is jit-compatible: the
    decoder is a hashable pure-function dataclass captured statically.
    """

    def __init__(self, net: Net, decoder: Any, output_raw: bool = True) -> None:
        self.net = net
        self.decoder = decoder
        self.output_raw = output_raw

    def apply(self, variables, *inputs: jnp.ndarray) -> Tuple[Any, ...]:
        x = self.net.apply(variables, inputs[0], train=False)
        result = self.decoder(x, *inputs[1:])
        if self.output_raw:
            return result, x
        return result

    def __call__(self, variables, *inputs: jnp.ndarray) -> Tuple[Any, ...]:
        return self.apply(variables, *inputs)


class NetWithLoss:
    """Forward + loss (ref networks.py:79-106).

    ``apply`` runs the net in train mode with mutable batch stats and
    returns ``(loss, updated_batch_stats)`` — the shape expected by
    ``jax.value_and_grad(..., has_aux=True)`` in the train step.
    """

    def __init__(self, net: Net, loss: Any, has_extra_inputs: bool = False) -> None:
        self.net = net
        self.loss = loss
        self.has_extra_inputs = has_extra_inputs

    def apply(
        self,
        variables,
        data: jnp.ndarray,
        label: jnp.ndarray,
        *extra_inputs: jnp.ndarray,
    ):
        out, updates = self.net.apply(
            variables, data, train=True, mutable=["batch_stats"]
        )
        if self.has_extra_inputs:
            loss = self.loss(out, label, *extra_inputs)
        else:
            loss = self.loss(out, label)
        return loss, updates["batch_stats"]

    def __call__(self, variables, data, label, *extra_inputs):
        return self.apply(variables, data, label, *extra_inputs)

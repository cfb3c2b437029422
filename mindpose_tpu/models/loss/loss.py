"""Loss base: pure-function losses as hashable frozen dataclasses.

Unlike the reference's ``nn.Cell`` losses
(/root/reference/mindpose/models/loss/loss.py), losses here are stateless
callables over jnp arrays, so they can be captured statically by ``jit`` and
composed inside the train step. Reduction semantics mirror MindSpore's
``LossBase.get_loss``: weight multiplies elementwise, then the reduction is
taken over *all* elements.
"""
import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Loss:
    reduction: Optional[str] = "mean"

    def get_loss(
        self, x: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if weights is not None:
            x = x * weights
        if self.reduction == "mean":
            return jnp.mean(x)
        if self.reduction == "sum":
            return jnp.sum(x)
        return x

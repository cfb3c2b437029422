"""Neck interface (parity: /root/reference/mindpose/models/necks/neck.py:6-18).

The reference defines no concrete neck (all configs use ``neck_name: ""``);
the abstract interface is kept so custom necks can slot between backbone and
head via the registry.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class Neck(nn.Module):
    """Abstract neck: NHWC features in, NHWC features out."""

    out_channels: int = 256

    def __call__(self, x: jnp.ndarray, train: bool = True) -> Any:
        raise NotImplementedError("Neck must implement __call__.")

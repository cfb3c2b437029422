"""Head interface (parity: /root/reference/mindpose/models/heads/head.py)."""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class Head(nn.Module):
    """Abstract head: maps NHWC backbone features to heatmap outputs."""

    def __call__(self, x: jnp.ndarray, train: bool = True) -> Any:
        raise NotImplementedError("Head must implement __call__.")

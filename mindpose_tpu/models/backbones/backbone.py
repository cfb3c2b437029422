"""Backbone interface.

TPU-native counterpart of the reference backbone base
(/root/reference/mindpose/models/backbones/backbone.py:7-36): a Flax module
producing a single feature map in NHWC layout, exposing ``out_channels`` so
the model factory can wire the neck/head input width.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class Backbone(nn.Module):
    """Abstract backbone: ``__call__(x, train)`` returns NHWC features."""

    @property
    def out_channels(self) -> int:
        raise NotImplementedError("Backbone must define out_channels.")

    def __call__(self, x: jnp.ndarray, train: bool = True) -> Any:
        raise NotImplementedError("Backbone must implement __call__.")

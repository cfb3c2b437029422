"""HRNet head: a single 1x1 conv over the high-resolution feature.

Parity: /root/reference/mindpose/models/heads/hrnet_head.py:13-49, in NHWC.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...register import register
from .head import Head
from ..common import final_kernel_init

Dtype = Any


@register("head", extra_name="hrnet_head")
class HRNetHead(Head):
    in_channels: int = 32
    num_joints: int = 17
    final_conv_kernel_size: int = 1
    dtype: Dtype = jnp.float32
    # accepted for head_setting uniformity; this head has no BatchNorm
    bn_grad_stats: str = "exact"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        k = self.final_conv_kernel_size
        pad = ((1, 1), (1, 1)) if k == 3 else ((0, 0), (0, 0))
        x = nn.Conv(
            self.num_joints,
            (k, k),
            padding=pad,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=final_kernel_init,
            name="head",
        )(x.astype(self.dtype))
        return x

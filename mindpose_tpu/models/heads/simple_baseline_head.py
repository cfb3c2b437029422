"""SimpleBaseline head: deconv stack + 1x1 conv -> K heatmaps.

TPU-native re-design of the reference head
(/root/reference/mindpose/models/heads/simple_baseline_head.py:16-98): three
ConvTranspose(k4, s2) + BN + ReLU stages then a 1x1 conv, in NHWC. On TPU the
transposed convs lower to MXU-friendly grad-conv kernels under XLA.
"""
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...register import register
from ..common import batch_norm, conv_kernel_init, final_kernel_init
from .head import Head

Dtype = Any


@register("head", extra_name="simple_baseline_head")
class SimpleBaselineHead(Head):
    """Deconvolution head from `Simple Baselines <https://arxiv.org/abs/1804.06208>`_."""

    num_deconv_layers: int = 3
    num_deconv_filters: Sequence[int] = (256, 256, 256)
    num_deconv_kernels: Sequence[int] = (4, 4, 4)
    in_channels: int = 2048
    num_joints: int = 17
    final_conv_kernel_size: int = 1
    dtype: Dtype = jnp.float32
    bn_grad_stats: str = "exact"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i in range(self.num_deconv_layers):
            k = self.num_deconv_kernels[i]
            if k not in (2, 4):
                raise ValueError("Invalid deconv_kernel.")
            x = nn.ConvTranspose(
                self.num_deconv_filters[i],
                (k, k),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                kernel_init=conv_kernel_init,
            )(x)
            x = batch_norm(train, self.dtype, grad_stats=self.bn_grad_stats)(x)
            x = nn.relu(x)
        k = self.final_conv_kernel_size
        pad = ((1, 1), (1, 1)) if k == 3 else ((0, 0), (0, 0))
        x = nn.Conv(
            self.num_joints,
            (k, k),
            padding=pad,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=final_kernel_init,
            name="final_layer",
        )(x)
        return x

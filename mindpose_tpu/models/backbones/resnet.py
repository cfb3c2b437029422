"""ResNet backbones (ResNet-50/101/152) for SimpleBaseline pose estimation.

TPU-native Flax/NHWC re-design of the reference ResNet
(/root/reference/mindpose/models/backbones/resnet.py:18-339): same topology
(7x7/2 stem + maxpool, four bottleneck stages [3,4,6,3]/[3,4,23,3]/[3,8,36,3],
expansion 4, out_channels 2048) but pure-functional modules with bf16 compute
and float32 params, composed under ``jit``.
"""
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...register import register
from ..common import batch_norm, conv1x1, conv3x3, conv_kernel_init
from .backbone import Backbone

__all__ = ["ResNet", "resnet50", "resnet101", "resnet152"]

Dtype = Any


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (expansion 1)."""

    channels: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 1
    bn_stats_frac: float = 1.0
    bn_grad_stats: str = "exact"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        identity = x
        out = conv3x3(self.channels, self.stride, self.dtype)(x)
        out = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(out)
        out = nn.relu(out)
        out = conv3x3(self.channels, 1, self.dtype)(out)
        out = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(out)
        if self.downsample:
            identity = conv1x1(self.channels, self.stride, self.dtype)(x)
            identity = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block (expansion 4)."""

    channels: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4
    bn_stats_frac: float = 1.0
    bn_grad_stats: str = "exact"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        identity = x
        out = conv1x1(self.channels, 1, self.dtype)(x)
        out = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(out)
        out = nn.relu(out)
        out = conv3x3(self.channels, self.stride, self.dtype)(out)
        out = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(out)
        out = nn.relu(out)
        out = conv1x1(self.channels * self.expansion, 1, self.dtype)(out)
        out = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(out)
        if self.downsample:
            identity = conv1x1(self.channels * self.expansion, self.stride, self.dtype)(x)
            identity = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(identity)
        return nn.relu(out + identity)


class ResNet(Backbone):
    """ResNet feature extractor; returns the stage-4 NHWC feature map."""

    block_counts: Sequence[int] = (3, 4, 6, 3)
    in_channels: int = 3
    dtype: Dtype = jnp.float32
    bn_stats_frac: float = 1.0
    bn_grad_stats: str = "exact"

    STAGE_CHANNELS = (64, 128, 256, 512)

    @property
    def out_channels(self) -> int:
        return self.STAGE_CHANNELS[-1] * Bottleneck.expansion

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=conv_kernel_init,
            name="conv1",
        )(x)
        x = batch_norm(train, self.dtype, name="bn1", stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, (channels, count) in enumerate(
            zip(self.STAGE_CHANNELS, self.block_counts)
        ):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(
                channels, stride=stride, downsample=True, dtype=self.dtype,
                bn_stats_frac=self.bn_stats_frac,
                bn_grad_stats=self.bn_grad_stats,
            )(x, train)
            for _ in range(1, count):
                x = Bottleneck(
                    channels, dtype=self.dtype, bn_stats_frac=self.bn_stats_frac,
                    bn_grad_stats=self.bn_grad_stats,
                )(x, train)
        return x


def _resnet(block_counts, in_channels: int, dtype: Dtype, **kwargs: Any) -> ResNet:
    return ResNet(
        block_counts=tuple(block_counts),
        in_channels=in_channels,
        dtype=dtype,
        bn_stats_frac=float(kwargs.get("bn_stats_frac", 1.0)),
        bn_grad_stats=str(kwargs.get("bn_grad_stats", "exact")),
    )


@register("backbone")
def resnet50(
    pretrained: bool = False,
    ckpt_url: str = "",
    in_channels: int = 3,
    dtype: Dtype = jnp.float32,
    **kwargs: Any,
) -> ResNet:
    """ResNet-50 (parity: /root/reference/mindpose/models/backbones/resnet.py:276)."""
    return _resnet((3, 4, 6, 3), in_channels, dtype, **kwargs)


@register("backbone")
def resnet101(
    pretrained: bool = False,
    ckpt_url: str = "",
    in_channels: int = 3,
    dtype: Dtype = jnp.float32,
    **kwargs: Any,
) -> ResNet:
    """ResNet-101 (parity: /root/reference/mindpose/models/backbones/resnet.py:298)."""
    return _resnet((3, 4, 23, 3), in_channels, dtype, **kwargs)


@register("backbone")
def resnet152(
    pretrained: bool = False,
    ckpt_url: str = "",
    in_channels: int = 3,
    dtype: Dtype = jnp.float32,
    **kwargs: Any,
) -> ResNet:
    """ResNet-152 (parity: /root/reference/mindpose/models/backbones/resnet.py:320)."""
    return _resnet((3, 8, 36, 3), in_channels, dtype, **kwargs)

"""HigherHRNet head: per-level 1x1 "final" convs + deconv refinement stage.

TPU-native re-design of the reference head
(/root/reference/mindpose/models/heads/higher_hrnet_head.py:72-230): level-0
1x1 conv emits K(+K tags) channels; the feature (optionally concatenated with
that output) goes through ConvTranspose(k4,s2)+BN+ReLU and 4 BasicBlocks, then
a second 1x1 conv at 2x resolution. Returns a list of per-level NHWC outputs.
"""
from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ...register import register
from ..backbones.resnet import BasicBlock
from ..backbones.s2d import (
    ConvKernel,
    ParityGroupBatchNorm,
    S2DBasicBlock,
    depth_to_space,
    scatter_deconv4x4_s2,
)
from ..common import batch_norm, conv_kernel_init, final_kernel_init
from .head import Head

Dtype = Any


@register("head", extra_name="higher_hrnet_head")
class HigherHRNetHead(Head):
    in_channels: int = 32
    num_joints: int = 17
    with_ae_loss: Sequence[bool] = (True, False)
    tag_per_joint: bool = True
    final_conv_kernel_size: int = 1
    num_deconv_layers: int = 1
    num_deconv_filters: Sequence[int] = (32,)
    num_deconv_kernels: Sequence[int] = (4,)
    cat_outputs: Sequence[bool] = (True,)
    num_basic_blocks: int = 4
    dtype: Dtype = jnp.float32
    bn_grad_stats: str = "exact"
    # run each deconv refinement stage (ConvTranspose + BasicBlocks) in 2x2
    # space-to-depth form: exact math / identical param pytree, but the
    # C=32 chain at 2x resolution becomes a 128-lane-dense chain at 1x —
    # measured 2.2x on its conv chain, see docs/performance.md (round 4)
    s2d_refine: bool = True

    def _final_channels(self, level: int) -> int:
        dim_tag = self.num_joints if self.tag_per_joint else 1
        if self.with_ae_loss[level]:
            return self.num_joints + dim_tag
        return self.num_joints

    def _final_conv(self, features: int, name: str) -> nn.Conv:
        k = self.final_conv_kernel_size
        pad = ((1, 1), (1, 1)) if k == 3 else ((0, 0), (0, 0))
        return nn.Conv(
            features, (k, k), padding=pad, use_bias=True, dtype=self.dtype,
            kernel_init=final_kernel_init, name=name,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> List[jnp.ndarray]:
        x = x.astype(self.dtype)
        outputs = []
        y = self._final_conv(self._final_channels(0), "final_0")(x)
        outputs.append(y)

        for i in range(self.num_deconv_layers):
            if self.cat_outputs[i]:
                x = jnp.concatenate([x, y], axis=-1)
            k = self.num_deconv_kernels[i]
            if k not in (2, 4):
                raise ValueError("Invalid deconv_kernel.")
            if self.s2d_refine and k == 4:
                x = self._s2d_stage(x, i, train)
            else:
                x = nn.ConvTranspose(
                    self.num_deconv_filters[i],
                    (k, k),
                    strides=(2, 2),
                    padding="SAME",
                    use_bias=False,
                    dtype=self.dtype,
                    kernel_init=conv_kernel_init,
                    name=f"ConvTranspose_{i}",
                )(x)
                x = batch_norm(train, self.dtype, grad_stats=self.bn_grad_stats,
                               name=f"BatchNorm_{i}")(x)
                x = nn.relu(x)
                for _ in range(self.num_basic_blocks):
                    x = BasicBlock(
                        self.num_deconv_filters[i], dtype=self.dtype,
                        bn_grad_stats=self.bn_grad_stats,
                    )(x, train)
            y = self._final_conv(self._final_channels(i + 1), f"final_{i + 1}")(x)
            outputs.append(y)

        return outputs

    def _s2d_stage(self, x: jnp.ndarray, i: int, train: bool) -> jnp.ndarray:
        """Deconv + BN + relu + BasicBlocks, all in s2d form (exact math,
        identical param pytree to the plain branch above): the stride-2
        ConvTranspose *emits* s2d layout directly (scatter_deconv4x4_s2), the
        blocks run 128-lane-dense at 1x resolution, and one depth_to_space
        at the end restores plain layout for the final conv."""
        f = self.num_deconv_filters[i]
        w = ConvKernel((4, 4, x.shape[-1], f), name=f"ConvTranspose_{i}")()
        x = lax.conv_general_dilated(
            x.astype(self.dtype), scatter_deconv4x4_s2(w).astype(self.dtype),
            (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = ParityGroupBatchNorm(
            parity=4, use_running_average=not train, dtype=self.dtype,
            grad_stats=self.bn_grad_stats, name=f"BatchNorm_{i}")(x)
        x = nn.relu(x)
        for _ in range(self.num_basic_blocks):
            x = S2DBasicBlock(
                f, dtype=self.dtype, bn_grad_stats=self.bn_grad_stats,
            )(x, train)
        return depth_to_space(x)

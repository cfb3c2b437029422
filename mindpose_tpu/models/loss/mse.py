"""Joint MSE losses over NHWC heatmaps.

Parity: /root/reference/mindpose/models/loss/mse.py:10-72, with the layout
transposed to NHWC ([N, H, W, K] heatmaps, [N, K] weights, [N, H, W] masks).
"""
import dataclasses
from typing import Optional

import jax.numpy as jnp

from ...register import register
from .loss import Loss


@register("loss", extra_name="joint_mse")
@dataclasses.dataclass(frozen=True)
class JointsMSELoss(Loss):
    """MSE over heatmaps with optional per-joint target weights.

    Inputs: pred/target [N, H, W, K]; target_weight [N, K].
    """

    use_target_weight: bool = False

    def __call__(
        self,
        pred: jnp.ndarray,
        target: jnp.ndarray,
        target_weight: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        loss = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
        if self.use_target_weight:
            return self.get_loss(loss, target_weight[:, None, None, :])
        return self.get_loss(loss)


@register("loss", extra_name="joint_mse_with_mask")
@dataclasses.dataclass(frozen=True)
class JointsMSELossWithMask(Loss):
    """MSE over heatmaps where masked-out pixels do not contribute.

    Inputs: pred/target [N, H, W, K]; mask [N, H, W].
    """

    def __call__(
        self, pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        loss = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
        return self.get_loss(loss, mask[:, :, :, None].astype(jnp.float32))

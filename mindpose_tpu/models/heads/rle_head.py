"""RLE regression head: direct keypoint coordinates with learned scale.

Beyond the reference (its heads stop at heatmap regression): the regression
head from "Human Pose Regression with Residual Log-likelihood Estimation"
(arXiv:2107.11291 §4). Backbone features are global-average-pooled and two
linear layers predict, per keypoint, a normalized coordinate ``mu`` and a
per-axis uncertainty ``sigma`` in (0, 1) (sigmoid). TPU-wise this is the
cheapest possible head — one GAP plus two [C, 4K]-ish Dense layers that
tile straight onto the MXU, no deconv pyramid and no [N, H, W, K] heatmap
tensor in HBM.

Coordinate convention (shared with the ``rle`` loss, the ``regression``
decoder and ``topdown_generate_regression_target``): ``mu`` is in units of
the network input size, ``mu = pixel / (W, H)`` — (0, 0) is the crop's
top-left, (1, 1) the bottom-right.

Output: ``(mu [N, K, 2], sigma [N, K, 2])``, both float32.
"""
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...register import register
from .head import Head

Dtype = Any


@register("head", extra_name="rle_head")
class RLERegressionHead(Head):
    """GAP -> Dense(2K) mu + Dense(2K) sigmoid sigma.

    Args:
        in_channels: backbone output channels.
        num_joints: K.
    """

    in_channels: int = 2048
    num_joints: int = 17
    dtype: Dtype = jnp.float32
    # accepted for head_setting uniformity; this head has no BatchNorm
    bn_grad_stats: str = "exact"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        feat = jnp.mean(x, axis=(1, 2))  # [N, C] global average pool
        n = feat.shape[0]
        mu = nn.Dense(self.num_joints * 2, dtype=self.dtype,
                      name="fc_coord")(feat)
        sigma = nn.Dense(self.num_joints * 2, dtype=self.dtype,
                         name="fc_sigma")(feat)
        mu = mu.astype(jnp.float32).reshape(n, self.num_joints, 2)
        sigma = nn.sigmoid(sigma.astype(jnp.float32)).reshape(
            n, self.num_joints, 2
        )
        return mu, sigma

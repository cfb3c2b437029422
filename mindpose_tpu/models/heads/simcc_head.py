"""SimCC head: coordinate classification over disentangled x/y bins.

Beyond the reference (its heads stop at heatmap regression): "SimCC: a
Simple Coordinate Classification perspective for Human Pose Estimation"
(arXiv:2107.03332). The backbone feature map maps to per-keypoint logits
over ``split_ratio``-upsampled horizontal and vertical bins — sub-pixel
localization without any deconv stage. TPU-wise this swaps the deconv
pyramid's small convs for two large Dense layers, which tile straight onto
the MXU.

Output: ``(x_logits [N, K, W*ratio], y_logits [N, K, H*ratio])``.
"""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...register import register
from .head import Head

Dtype = Any


@register("head", extra_name="simcc_head")
class SimCCHead(Head):
    """1x1 conv to K channels -> flatten spatial -> shared x/y bin Dense.

    Args:
        in_channels: backbone output channels.
        num_joints: K.
        input_size: the network input (W, H) in pixels — bin counts are
            ``input_size * split_ratio``.
        split_ratio: bins per input pixel (paper default 2.0).
    """

    in_channels: int = 2048
    num_joints: int = 17
    input_size: Sequence[int] = (192, 256)
    split_ratio: float = 2.0
    dtype: Dtype = jnp.float32
    # accepted for head_setting uniformity; this head has no BatchNorm
    bn_grad_stats: str = "exact"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w_bins = int(self.input_size[0] * self.split_ratio)
        h_bins = int(self.input_size[1] * self.split_ratio)
        x = x.astype(self.dtype)
        x = nn.Conv(self.num_joints, (1, 1), use_bias=True, dtype=self.dtype,
                    name="final_conv")(x)
        n, h, w, k = x.shape
        # [N, K, h*w]: one flattened spatial vector per keypoint; the bin
        # classifiers are shared across keypoints (paper §3.1)
        x = x.transpose(0, 3, 1, 2).reshape(n, k, h * w)
        x_logits = nn.Dense(w_bins, dtype=self.dtype, name="mlp_x")(x)
        y_logits = nn.Dense(h_bins, dtype=self.dtype, name="mlp_y")(x)
        return x_logits.astype(jnp.float32), y_logits.astype(jnp.float32)

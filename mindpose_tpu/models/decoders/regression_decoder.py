"""Regression decoder: normalized (mu, sigma) -> original-frame keypoints.

Beyond the reference: decodes heads/rle_head.py outputs on device under
jit. ``mu`` is in input-size units (pixel / (W, H)); scaling by the input
size gives crop pixels, then the same center/scale/pixel_std geometry as
the heatmap decoder maps to the raw frame. The keypoint score is
``1 - mean(sigma)`` (the RLE paper's inference-time confidence): a
certain prediction (sigma -> 0) scores ~1, comparable to heatmap maxvals
for the evaluator's vis_thr rescoring.
"""
import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp

from ...register import register
from .decoder import Decoder


@register("decoder", extra_name="regression")
@dataclasses.dataclass(frozen=True)
class RegressionDecoder(Decoder):
    """Inputs: ``(mu [N, K, 2], sigma [N, K, 2])``; center [N, 2];
    scale [N, 2]; score [N].
    Outputs: preds [N, K, 3]; boxes [N, 6] (same contract as
    TopDownHeatMapDecoder, so inferencer/evaluator plug in unchanged).
    """

    input_size: Sequence[int] = (192, 256)  # (W, H)
    pixel_std: float = 200.0
    to_original: bool = True

    def __post_init__(self):
        # yaml lists are unhashable; keep the dataclass jit-static-safe
        object.__setattr__(self, "input_size", tuple(self.input_size))

    def __call__(
        self,
        pred: Tuple[jnp.ndarray, jnp.ndarray],
        center: jnp.ndarray,
        scale: jnp.ndarray,
        score: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mu, sigma = pred
        mu = mu.astype(jnp.float32)
        center = center.astype(jnp.float32)
        scale = scale.astype(jnp.float32)
        score = score.astype(jnp.float32).reshape(mu.shape[0])

        w, h = int(self.input_size[0]), int(self.input_size[1])
        coords = mu * jnp.asarray([w, h], jnp.float32)  # crop pixels
        maxvals = jnp.clip(
            1.0 - jnp.mean(sigma.astype(jnp.float32), axis=-1), 0.0, 1.0
        )
        if self.to_original:
            s = scale * self.pixel_std
            coords = jnp.stack(
                [
                    coords[..., 0] * (s[:, 0:1] / w) + center[:, 0:1]
                    - s[:, 0:1] * 0.5,
                    coords[..., 1] * (s[:, 1:2] / h) + center[:, 1:2]
                    - s[:, 1:2] * 0.5,
                ],
                axis=-1,
            )
        preds = jnp.concatenate([coords, maxvals[..., None]], axis=-1)
        area = jnp.prod(scale * self.pixel_std, axis=1)
        boxes = jnp.concatenate(
            [center, scale, area[:, None], score[:, None]], axis=1
        )
        return preds, boxes

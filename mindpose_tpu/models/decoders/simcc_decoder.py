"""SimCC decoder: per-axis bin argmax -> input-pixel coords -> original frame.

Beyond the reference: decodes heads/simcc_head.py logits on device under
jit. Coordinates come from the x/y bin argmaxes divided by the split ratio
(input-image pixels), then map to the raw frame with the same
center/scale/pixel_std geometry as the heatmap decoder — heatmap_hw is just
the input size here. The keypoint score is the softmax peak normalized by
the ideal discrete-Gaussian peak (sigma*sqrt(2*pi)), so a confident
prediction scores ~1 — comparable to heatmap maxvals for the evaluator's
vis_thr rescoring.
"""
import dataclasses
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ...register import register
from .decoder import Decoder


@register("decoder", extra_name="simcc")
@dataclasses.dataclass(frozen=True)
class SimCCDecoder(Decoder):
    """Inputs: ``(x_logits [N,K,Bx], y_logits [N,K,By])``; center [N, 2];
    scale [N, 2]; score [N].
    Outputs: preds [N, K, 3]; boxes [N, 6] (same contract as
    TopDownHeatMapDecoder, so inferencer/evaluator plug in unchanged).
    """

    input_size: Sequence[int] = (192, 256)  # (W, H)
    split_ratio: float = 2.0
    sigma: float = 6.0  # label sigma in bins; normalizes the score
    pixel_std: float = 200.0
    to_original: bool = True

    def __post_init__(self):
        # yaml lists are unhashable; keep the dataclass jit-static-safe
        object.__setattr__(self, "input_size", tuple(self.input_size))

    def __call__(
        self,
        logits: Tuple[jnp.ndarray, jnp.ndarray],
        center: jnp.ndarray,
        scale: jnp.ndarray,
        score: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x_logits, y_logits = logits
        center = center.astype(jnp.float32)
        scale = scale.astype(jnp.float32)
        score = score.astype(jnp.float32).reshape(x_logits.shape[0])

        px = jax.nn.softmax(x_logits.astype(jnp.float32), axis=-1)
        py = jax.nn.softmax(y_logits.astype(jnp.float32), axis=-1)
        x = jnp.argmax(px, axis=-1).astype(jnp.float32) / self.split_ratio
        y = jnp.argmax(py, axis=-1).astype(jnp.float32) / self.split_ratio
        # ideal peak of a sum-1 discrete Gaussian is ~1/(sigma*sqrt(2*pi))
        peak = self.sigma * math.sqrt(2.0 * math.pi)
        maxvals = jnp.minimum(
            jnp.max(px, axis=-1) * peak, jnp.max(py, axis=-1) * peak
        )

        coords = jnp.stack([x, y], axis=-1)
        if self.to_original:
            w, h = int(self.input_size[0]), int(self.input_size[1])
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

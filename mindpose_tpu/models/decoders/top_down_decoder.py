"""Top-down heatmap decoder: argmax -> sub-pixel refine -> original frame.

Parity: /root/reference/mindpose/models/decoders/top_down_decoder.py:13-215,
re-designed for TPU: fixed-shape gathers instead of masked_select, closed-form
2x2 Hessian inverse for DARK/UDP refinement, NHWC heatmaps. Runs fully
on-device under jit.
"""
import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ...ops.heatmap import (
    argmax_coords,
    dark_udp_refine,
    gaussian_kernel_2d,
    quarter_offset,
)
from ...register import register
from .decoder import Decoder


@register("decoder", extra_name="topdown_heatmap")
@dataclasses.dataclass(frozen=True)
class TopDownHeatMapDecoder(Decoder):
    """Decode NHWC heatmaps into keypoint coordinates with boxes.

    Inputs: heatmap [N, H, W, K]; center [N, 2]; scale [N, 2]; score [N].
    Outputs: preds [N, K, 3(x, y, score)];
             boxes [N, 6(cx, cy, sx, sy, area, box_score)].
    """

    pixel_std: float = 200.0
    to_original: bool = True
    shift_coordinate: bool = False
    use_udp: bool = False
    dark_udp_refine: bool = False
    kernel_size: int = 11
    # "xla" (default) or "pallas": fused single-VMEM-pass argmax+shift kernel
    # (ops/pallas/decode.py). The pallas path is opt-in because Mosaic
    # compilation through remote-compile tunnels can be slow.
    backend: str = "xla"

    def __post_init__(self):
        if self.dark_udp_refine and self.shift_coordinate:
            raise ValueError(
                "`dark_udp_refine` and `shift_coordinate` cannot both be true."
            )

    def __call__(
        self,
        heatmap: jnp.ndarray,
        center: jnp.ndarray,
        scale: jnp.ndarray,
        score: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        heatmap = heatmap.astype(jnp.float32)
        center = center.astype(jnp.float32)
        scale = scale.astype(jnp.float32)
        score = score.astype(jnp.float32).reshape(heatmap.shape[0])

        import jax

        use_pallas = (
            self.backend == "pallas"
            and not self.dark_udp_refine
            and jax.default_backend() == "tpu"  # Mosaic kernels are TPU-only
        )
        if use_pallas:
            from ...ops.pallas.decode import argmax_shift_decode

            n, h, w, k = heatmap.shape
            coords, maxvals = argmax_shift_decode(
                heatmap, h, w, shift=self.shift_coordinate
            )
        else:
            coords, maxvals, idx = argmax_coords(heatmap)
            if self.shift_coordinate:
                coords = quarter_offset(heatmap, coords, idx)
            elif self.dark_udp_refine:
                kernel = jnp.asarray(gaussian_kernel_2d(self.kernel_size))
                coords = dark_udp_refine(coords, heatmap, kernel)
        if self.to_original:
            coords = self._transform_preds(coords, center, scale, heatmap.shape[1:3])

        preds = jnp.concatenate([coords[..., :2], maxvals[..., None]], axis=-1)
        area = jnp.prod(scale * self.pixel_std, axis=1)
        boxes = jnp.concatenate(
            [center, scale, area[:, None], score[:, None]], axis=1
        )
        return preds, boxes

    def _transform_preds(
        self,
        coords: jnp.ndarray,
        center: jnp.ndarray,
        scale: jnp.ndarray,
        heatmap_hw: Tuple[int, int],
    ) -> jnp.ndarray:
        """Map heatmap coords back to the raw-image frame (ref :143-169)."""
        h, w = heatmap_hw
        scale = scale * self.pixel_std
        if self.use_udp:
            scale_x = scale[:, 0:1] / (w - 1.0)
            scale_y = scale[:, 1:2] / (h - 1.0)
        else:
            scale_x = scale[:, 0:1] / w
            scale_y = scale[:, 1:2] / h
        x = coords[..., 0] * scale_x + center[:, 0:1] - scale[:, 0:1] * 0.5
        y = coords[..., 1] * scale_y + center[:, 1:2] - scale[:, 1:2] * 0.5
        return jnp.stack([x, y], axis=-1)

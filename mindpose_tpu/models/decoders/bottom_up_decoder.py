"""Bottom-up heatmap + associative-embedding decoder.

Parity: /root/reference/mindpose/models/decoders/bottom_up_decoder.py:13-203,
NHWC and jit-native: multi-resolution aggregation, tag resize/stack, mask
fill, maxpool-NMS via reduce_window, per-joint top-K with gathered tags, and
an optional +-0.25 shift computed with fixed-shape gathers.
"""
import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp

from ...models.common import resize_bilinear, resize_nearest
from ...register import register
from .decoder import Decoder


@register("decoder", extra_name="bottomup_heatmap_ae")
@dataclasses.dataclass(frozen=True)
class BottomUpHeatMapAEDecoder(Decoder):
    """Decode multi-level NHWC outputs into top-K candidates per joint.

    Inputs: model_output — list of [N, H_s, W_s, K(+K tags)] tensors (one per
    stage); mask [N, H_img, W_img] validity mask.

    Outputs (shapes chosen to feed the host tag-grouping directly):
        val_k [N, K, M], tag_k [N, K, M, L], ind_k [N, K, M, 2(x, y)],
        heatmap [N, H, W, K] (pre-NMS), tagging_heatmap [N, H, W, K, L].
    """

    num_joints: int = 17
    num_stages: int = 2
    with_ae_loss: Sequence[bool] = (True, False)
    use_nms: bool = False
    nms_kernel: int = 5
    max_num: int = 30
    tag_per_joint: bool = True
    shift_coordinate: bool = False

    def __call__(self, model_output: List[jnp.ndarray], mask: jnp.ndarray):
        heatmaps, tagging_heatmaps = self.decouple_output(model_output)
        return self.decode(heatmaps, tagging_heatmaps, mask)

    def decouple_output(self, output: List[jnp.ndarray]):
        """Split per-stage channels into heatmaps and tag maps (ref :93-100)."""
        heatmaps, tagging_heatmaps = [], []
        for i in range(self.num_stages):
            heatmaps.append(output[i][..., : self.num_joints].astype(jnp.float32))
            if self.with_ae_loss[i]:
                tagging_heatmaps.append(
                    output[i][..., self.num_joints :].astype(jnp.float32)
                )
        return heatmaps, tagging_heatmaps

    def decode(
        self,
        heatmaps: List[jnp.ndarray],
        tagging_heatmaps: List[jnp.ndarray],
        mask: jnp.ndarray,
    ):
        heatmap, tagging_heatmap = self._parse_heatmaps(
            heatmaps, tagging_heatmaps, mask
        )
        heatmap_raw = heatmap

        if self.use_nms:
            heatmap = self._nms(heatmap)

        val_k, tag_k, ind_k, idx = self._get_max_preds(heatmap, tagging_heatmap)

        if self.shift_coordinate:
            ind_k = self._shift(ind_k, heatmap_raw, idx)

        return val_k, tag_k, ind_k, heatmap_raw, tagging_heatmap

    def _parse_heatmaps(self, heatmaps, tagging_heatmaps, mask):
        # mean-aggregate multi-resolution heatmaps at the largest resolution
        base = heatmaps[-1]
        n, h, w, k = base.shape
        if len(heatmaps) > 1:
            acc = base
            for hm in heatmaps[:-1]:
                acc = acc + resize_bilinear(hm, h, w)
            heatmap = acc / len(heatmaps)
        else:
            heatmap = base

        tags = [resize_bilinear(t, h, w) for t in tagging_heatmaps]
        tagging_heatmap = jnp.stack(tags, axis=-1)  # [N, H, W, K, L]

        mask = resize_nearest(mask[..., None].astype(jnp.float32), h, w)[..., 0]
        heatmap = heatmap * mask[..., None]
        return heatmap, tagging_heatmap

    def _nms(self, heatmap: jnp.ndarray) -> jnp.ndarray:
        """Keep only local maxima of a k x k window (ref :173-178)."""
        k = self.nms_kernel
        pooled = jax.lax.reduce_window(
            heatmap,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, 1, 1, 1),
            padding="SAME",
        )
        return jnp.where(pooled == heatmap, heatmap, 0.0)

    def _get_max_preds(self, heatmap, tagging_heatmap):
        n, h, w, k = heatmap.shape
        flat = heatmap.reshape(n, h * w, k).transpose(0, 2, 1)  # [N, K, HW]
        val_k, idx = jax.lax.top_k(flat, self.max_num)  # [N, K, M]

        l = tagging_heatmap.shape[-1]
        kt = tagging_heatmap.shape[3]
        tag_flat = tagging_heatmap.reshape(n, h * w, kt, l).transpose(0, 2, 1, 3)
        if not self.tag_per_joint:
            tag_flat = jnp.broadcast_to(tag_flat, (n, k, h * w, l))
        # gather tags at top-K heatmap positions
        tag_k = jnp.take_along_axis(tag_flat, idx[..., None], axis=2)  # [N,K,M,L]

        x = (idx % w).astype(jnp.float32)
        y = jnp.floor_divide(idx, w).astype(jnp.float32)
        ind_k = jnp.stack([x, y], axis=-1)  # [N, K, M, 2]
        return val_k, tag_k, ind_k, idx

    def _shift(self, ind_k, heatmap, idx):
        """+-0.25 shift toward the larger neighbour for each top-K candidate."""
        n, h, w, k = heatmap.shape
        flat = heatmap.reshape(n, h * w, k).transpose(0, 2, 1)  # [N, K, HW]

        def nb(offset):
            j = jnp.clip(idx + offset, 0, h * w - 1)
            return jnp.take_along_axis(flat, j, axis=2)

        x = ind_k[..., 0]
        y = ind_k[..., 1]
        dx = nb(1) - nb(-1)
        dy = nb(w) - nb(-w)
        dx = jnp.where((x >= 1) & (x <= w - 2), dx, 0.0)
        dy = jnp.where((y >= 1) & (y <= h - 2), dy, 0.0)
        offset = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
        return ind_k + offset

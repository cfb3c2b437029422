"""On-device image ops: batched inverse-affine bilinear warp + normalize.

TPU-native replacement for the cv2.warpAffine host hot loop
(/root/reference/mindpose/data/transform/topdown_transform.py:217,248 — HOT
LOOP #1 in SURVEY.md §3): each output pixel back-projects through the
per-sample inverse affine matrix and bilinearly samples the source, all as
fused XLA gathers under jit/vmap. Zero padding outside the source.
"""
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["affine_warp", "invert_affine", "normalize_image"]


def invert_affine(mat: jnp.ndarray) -> jnp.ndarray:
    """Invert 2x3 affine matrices ([..., 2, 3])."""
    a, b, tx = mat[..., 0, 0], mat[..., 0, 1], mat[..., 0, 2]
    c, d, ty = mat[..., 1, 0], mat[..., 1, 1], mat[..., 1, 2]
    det = a * d - b * c
    ia = d / det
    ib = -b / det
    ic = -c / det
    id_ = a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _warp_one(image: jnp.ndarray, inv_mat: jnp.ndarray, out_hw: Tuple[int, int]):
    """image [H, W, C]; inv_mat [2, 3] maps output (x, y) -> source (x, y)."""
    h, w = image.shape[:2]
    oh, ow = out_hw
    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [oh, ow]

    sx = inv_mat[0, 0] * gx + inv_mat[0, 1] * gy + inv_mat[0, 2]
    sy = inv_mat[1, 0] * gx + inv_mat[1, 1] * gy + inv_mat[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = image[yc, xc]  # gather -> [oh, ow, C]
        return vals * valid[..., None]

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)

    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


@partial(jax.jit, static_argnames=("out_hw",))
def affine_warp(
    images: jnp.ndarray, mats: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Warp a batch: images [N, H, W, C] with FORWARD 2x3 mats (src -> dst).

    Matches cv2.warpAffine(image, mat, (ow, oh), INTER_LINEAR) semantics:
    the matrix maps source to destination; sampling uses its inverse.
    """
    inv = invert_affine(mats.astype(jnp.float32))
    return jax.vmap(lambda im, m: _warp_one(im.astype(jnp.float32), m, out_hw))(
        images, inv
    )


@partial(jax.jit, static_argnames=())
def normalize_image(
    images: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray
) -> jnp.ndarray:
    """(x - 255*mean) / (255*std), NHWC float32."""
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    return (images.astype(jnp.float32) - mean) / std

"""On-device heatmap decode primitives (pure JAX, jit-friendly).

These replace the reference's masked_select/scatter formulations
(/root/reference/mindpose/models/decoders/top_down_decoder.py:96-205) with
fixed-shape gathers: everything is O(N*K) index arithmetic after the argmax,
which XLA fuses into a few kernels on TPU.

Layout convention: heatmaps are NHWC — [N, H, W, K].
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "argmax_coords",
    "gather_at_flat",
    "quarter_offset",
    "gaussian_blur_depthwise",
    "dark_udp_refine",
    "gaussian_kernel_2d",
]


def argmax_coords(heatmap: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-joint argmax of an NHWC heatmap.

    Returns (coords [N, K, 2] float (x, y), maxvals [N, K], flat_idx [N, K]).
    """
    n, h, w, k = heatmap.shape
    flat = heatmap.reshape(n, h * w, k)
    idx = jnp.argmax(flat, axis=1)  # [N, K]
    maxvals = jnp.max(flat, axis=1)  # [N, K]
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor_divide(idx, w).astype(jnp.float32)
    coords = jnp.stack([x, y], axis=-1)
    return coords, maxvals, idx


def gather_at_flat(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather flat[n, idx[n, k], k] -> [N, K] from flat [N, P, K]."""
    return jnp.take_along_axis(flat, idx[:, None, :], axis=1)[:, 0, :]


def quarter_offset(
    heatmap: jnp.ndarray, coords: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """+-0.25 px shift toward the larger neighbour, zero at borders.

    Matches the reference's zero-padded central-difference + sign
    (top_down_decoder.py:118-141) without materializing diff heatmaps.
    """
    n, h, w, k = heatmap.shape
    flat = heatmap.reshape(n, h * w, k)
    x = coords[..., 0]
    y = coords[..., 1]

    def nb(offset):
        j = jnp.clip(idx + offset, 0, h * w - 1)
        return gather_at_flat(flat, j)

    dx = nb(1) - nb(-1)
    dy = nb(w) - nb(-w)
    dx = jnp.where((x >= 1) & (x <= w - 2), dx, 0.0)
    dy = jnp.where((y >= 1) & (y <= h - 2), dy, 0.0)
    offset = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    return coords + offset


def gaussian_kernel_2d(kernel_size: int) -> np.ndarray:
    """Normalized 2D Gaussian with OpenCV's sigma rule (ref decoder :207-215)."""
    sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    xs = np.arange(-(kernel_size - 1) // 2, (kernel_size - 1) // 2 + 1, 1)
    ys = xs[:, None]
    kernel = np.exp(-(xs**2 + ys**2) / (2 * sigma**2))
    return (kernel / kernel.sum()).astype(np.float32)


def gaussian_blur_depthwise(heatmap: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'same' convolution of NHWC heatmap with a 2D kernel."""
    k = heatmap.shape[-1]
    kh, kw = kernel.shape
    filt = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, k))
    return jax.lax.conv_general_dilated(
        heatmap.astype(jnp.float32),
        filt.astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=k,
    )


def dark_udp_refine(
    coords: jnp.ndarray, heatmap: jnp.ndarray, kernel: jnp.ndarray
) -> jnp.ndarray:
    """DARK/UDP sub-pixel refinement via a Taylor step on the log-heatmap.

    Parity: top_down_decoder.py:171-205. The Gaussian-modulated heatmap is
    log-transformed; a single Newton step with the 2x2 Hessian (closed-form
    inverse — no MatrixInverse op) moves the argmax toward the true mode.

    coords: [N, K, 2] integer argmax positions; heatmap: [N, H, W, K].
    """
    n, h, w, k = heatmap.shape
    hm = gaussian_blur_depthwise(heatmap, kernel)
    hm = jnp.clip(hm, 0.001, 50.0)
    hm = jnp.log(hm)
    hm = jnp.pad(hm, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = hm.reshape(n, (h + 2) * (w + 2), k)

    xi = coords[..., 0].astype(jnp.int32) + 1
    yi = coords[..., 1].astype(jnp.int32) + 1
    stride = w + 2
    center = xi + yi * stride  # [N, K]

    def at(offset):
        return gather_at_flat(flat, center + offset)

    i0 = at(0)
    ix1 = at(1)
    ix1_ = at(-1)
    iy1 = at(stride)
    iy1_ = at(-stride)
    ix1y1 = at(stride + 1)
    ix1_y1_ = at(-stride - 1)

    dx = 0.5 * (ix1 - ix1_)
    dy = 0.5 * (iy1 - iy1_)
    dxx = ix1 - 2.0 * i0 + ix1_
    dyy = iy1 - 2.0 * i0 + iy1_
    dxy = 0.5 * (ix1y1 - ix1 - iy1 + 2.0 * i0 - ix1_ - iy1_ + ix1_y1_)

    # closed-form inverse of ([dxx, dxy], [dxy, dyy]) + 1e-7 * I
    a = dxx + 1e-7
    d = dyy + 1e-7
    b = dxy
    det = a * d - b * b
    inv_det = 1.0 / det
    step_x = inv_det * (d * dx - b * dy)
    step_y = inv_det * (a * dy - b * dx)
    return coords - jnp.stack([step_x, step_y], axis=-1)

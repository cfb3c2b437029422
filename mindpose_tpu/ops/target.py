"""On-device Gaussian heatmap target rasterization.

TPU-native replacement for the per-sample numpy Gaussian stamping in
TopDownGenerateTarget (/root/reference/mindpose/data/transform/
topdown_transform.py:324-430): the whole [N, H, W, K] target renders as one
fused elementwise expression — no windows, no scatter — while reproducing the
reference's semantics exactly (round-to-pixel centers with a shared kernel,
3-sigma window cutoff, UDP sub-pixel variant, OOB weight zeroing).
"""
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["generate_topdown_targets"]


@partial(
    jax.jit,
    static_argnames=("heatmap_size", "image_size", "sigma", "use_udp"),
)
def generate_topdown_targets(
    keypoints: jnp.ndarray,
    heatmap_size: Tuple[int, int],
    image_size: Tuple[int, int],
    sigma: float = 2.0,
    use_udp: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render per-joint Gaussian targets.

    Args:
        keypoints: [N, K, 3] (x, y in input-image pixels, visibility).
        heatmap_size: (W, H); image_size: (W, H).

    Returns:
        target [N, H, W, K] float32, target_weight [N, K] float32.
    """
    w, h = heatmap_size
    iw, ih = image_size
    tmp_size = sigma * 3.0

    kx = keypoints[..., 0]
    ky = keypoints[..., 1]
    vis = keypoints[..., 2]

    if use_udp:
        stride_x = (iw - 1.0) / (w - 1.0)
        stride_y = (ih - 1.0) / (h - 1.0)
        mu_x_ac = kx / stride_x
        mu_y_ac = ky / stride_y
        # the reference uses python int() = truncation toward zero, which
        # differs from floor for negative (out-of-heatmap) coordinates
        mu_x = jnp.trunc(mu_x_ac + 0.5).astype(jnp.int32)
        mu_y = jnp.trunc(mu_y_ac + 0.5).astype(jnp.int32)
        cx, cy = mu_x_ac, mu_y_ac  # sub-pixel-centered kernel
    else:
        stride_x = iw / w
        stride_y = ih / h
        # numpy round() is banker's rounding; jnp.round matches
        mu_x = jnp.round(kx / stride_x).astype(jnp.int32)
        mu_y = jnp.round(ky / stride_y).astype(jnp.int32)
        cx, cy = mu_x.astype(jnp.float32), mu_y.astype(jnp.float32)

    # OOB check identical to the reference: window entirely outside -> weight 0
    ul_x = mu_x - tmp_size
    ul_y = mu_y - tmp_size
    br_x = mu_x + tmp_size + 1
    br_y = mu_y + tmp_size + 1
    in_bounds = ~((ul_x >= w) | (ul_y >= h) | (br_x < 0) | (br_y < 0))
    weight = vis * in_bounds.astype(jnp.float32)  # [N, K]

    xs = jnp.arange(w, dtype=jnp.float32)[None, :, None]  # [1, W, 1]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None, None]  # [H, 1, 1]

    cx_b = cx[:, None, None, :]  # [N, 1, 1, K]
    cy_b = cy[:, None, None, :]
    g = jnp.exp(
        -((xs[None] - cx_b) ** 2 + (ys[None] - cy_b) ** 2) / (2.0 * sigma**2)
    )  # [N, H, W, K]

    # 3-sigma window cutoff around the integer center (the reference only
    # stamps the (2*3s+1)^2 window)
    mu_x_b = mu_x[:, None, None, :].astype(jnp.float32)
    mu_y_b = mu_y[:, None, None, :].astype(jnp.float32)
    win = (
        (jnp.abs(xs[None] - mu_x_b) <= tmp_size)
        & (jnp.abs(ys[None] - mu_y_b) <= tmp_size)
    )
    active = (weight > 0.5)[:, None, None, :]
    target = jnp.where(win & active, g, 0.0)
    return target.astype(jnp.float32), weight.astype(jnp.float32)

"""Pallas TPU kernel: fused heatmap argmax + quarter-pixel shift decode.

One VMEM pass per (instance, joint) row replaces the XLA decode's separate
argmax / max / neighbor-gather kernels (ops/heatmap.py): the [N*K, H*W]
heatmap rows stream through VMEM once; max, first-argmax (iota-min trick —
Mosaic has no native argmax), the four neighbor taps and the +-0.25 sign
shift all happen before anything returns to HBM.

Falls back to the pure-XLA path automatically off-TPU (interpret mode in
tests).
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["argmax_shift_decode"]

_ROW_BLOCK = 8
_OUT_COLS = 128  # lane-aligned output tile; cols 0..4 hold results


def _decode_kernel(hm_ref, out_ref, *, width: int, height: int, shift: bool):
    """hm_ref: [R_B, P] heatmap rows; out_ref: [R_B, 128].

    out columns: 0=maxval, 1=x, 2=y, 3=offset_x, 4=offset_y.
    """
    x = hm_ref[:]  # [R_B, P]
    p = x.shape[1]

    row_max = jnp.max(x, axis=1, keepdims=True)  # [R_B, 1]
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # first index attaining the max (mirrors jnp.argmax tie-breaking)
    idx = jnp.min(jnp.where(x >= row_max, pos, p), axis=1)  # [R_B]

    xi = idx % width
    yi = idx // width

    if shift:
        # neighbor taps without scatter/gather: one-hot select via iota masks
        # (each tap is a masked row-reduction — stays on the VPU)
        def tap(j):
            onehot = (pos == j[:, None]).astype(jnp.float32)
            return jnp.sum(x * onehot, axis=1)

        left = tap(jnp.maximum(idx - 1, 0))
        right = tap(jnp.minimum(idx + 1, p - 1))
        up = tap(jnp.maximum(idx - width, 0))
        down = tap(jnp.minimum(idx + width, p - 1))
        dx = jnp.where((xi >= 1) & (xi <= width - 2), right - left, 0.0)
        dy = jnp.where((yi >= 1) & (yi <= height - 2), down - up, 0.0)
        off_x = jnp.sign(dx) * 0.25
        off_y = jnp.sign(dy) * 0.25
    else:
        off_x = jnp.zeros_like(row_max[:, 0])
        off_y = jnp.zeros_like(row_max[:, 0])

    # compose the lane-aligned output tile via column masks (no scatter)
    col = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], _OUT_COLS), 1)
    cols = [
        row_max[:, 0],
        xi.astype(jnp.float32),
        yi.astype(jnp.float32),
        off_x,
        off_y,
    ]
    out = jnp.zeros((x.shape[0], _OUT_COLS), jnp.float32)
    for c, v in enumerate(cols):
        out = jnp.where(col == c, v[:, None], out)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("height", "width", "shift", "interpret"))
def argmax_shift_decode(
    heatmap: jnp.ndarray,
    height: int,
    width: int,
    shift: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused decode of NHWC heatmaps.

    Args:
        heatmap: [N, H, W, K] float32.

    Returns:
        coords [N, K, 2] (x, y with optional quarter shift), maxvals [N, K].
    """
    n, h, w, k = heatmap.shape
    assert (h, w) == (height, width)
    rows = n * k
    p = h * w

    flat = heatmap.transpose(0, 3, 1, 2).reshape(rows, p).astype(jnp.float32)
    padded_rows = (rows + _ROW_BLOCK - 1) // _ROW_BLOCK * _ROW_BLOCK
    if padded_rows != rows:
        flat = jnp.pad(flat, ((0, padded_rows - rows), (0, 0)))

    kernel = functools.partial(
        _decode_kernel, width=width, height=height, shift=shift
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((padded_rows, _OUT_COLS), jnp.float32),
        grid=(padded_rows // _ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, p), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (_ROW_BLOCK, _OUT_COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(flat)

    out = out[:rows]
    maxvals = out[:, 0].reshape(n, k)
    coords = (out[:, 1:3] + out[:, 3:5]).reshape(n, k, 2)
    return coords, maxvals

"""Shared building blocks for model definitions.

All models are NHWC (TPU-native conv layout) with a configurable compute
``dtype`` (bf16 by default under AMP) and float32 parameters. BatchNorm
statistics are always accumulated in float32 (flax upcasts internally).
"""
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# He-normal is the conventional init for conv+relu stacks.
conv_kernel_init = nn.initializers.he_normal()

# Final heatmap-regression convs start near zero so initial predictions sit
# at the heatmap background (MindSpore's Conv2d default is a small truncated
# normal; large inits waste early training undoing noise).
final_kernel_init = nn.initializers.truncated_normal(stddev=0.001)


def conv3x3(
    features: int, stride: int = 1, dtype: Dtype = jnp.float32, name: Optional[str] = None
) -> nn.Conv:
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        use_bias=False,
        dtype=dtype,
        kernel_init=conv_kernel_init,
        name=name,
    )


def conv1x1(
    features: int, stride: int = 1, dtype: Dtype = jnp.float32, name: Optional[str] = None
) -> nn.Conv:
    return nn.Conv(
        features,
        (1, 1),
        strides=(stride, stride),
        use_bias=False,
        dtype=dtype,
        kernel_init=conv_kernel_init,
        name=name,
    )


def batch_norm(
    train: bool, dtype: Dtype = jnp.float32, name: Optional[str] = None
) -> nn.BatchNorm:
    # momentum 0.9 mirrors the reference's BatchNorm2d default
    # (running = 0.9 * running + 0.1 * batch).
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


def resize_nearest(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Nearest-neighbour resize of an NHWC tensor (integer upscale fast-path).

    HRNet fusion only ever upsamples by powers of two; for that case a
    reshape-broadcast is cheaper for XLA than a general gather resize.
    """
    n, h, w, c = x.shape
    if height % h == 0 and width % w == 0:
        fh, fw = height // h, width // w
        if fh == 1 and fw == 1:
            return x
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, fh, w, fw, c))
        return x.reshape(n, height, width, c)
    import jax

    return jax.image.resize(x, (n, height, width, c), method="nearest")


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear (align_corners=False, half_pixel) resize of an NHWC tensor."""
    import jax

    n, _, _, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="bilinear")

"""Space-to-depth stem: an exact, checkpoint-compatible rewrite of the HRNet
stem that is MXU-dense on TPU.

The vanilla stem (two 3x3 stride-2 convs, ref
/root/reference/mindpose/models/backbones/hrnet.py:364-379) is MXU-hostile:
conv1 has C_in=3 (contraction dim 27 on a 128-wide systolic array) and both
convs run at the largest spatial resolutions in the network. The classic TPU
fix (MLPerf ResNet "conv0 space-to-depth") reshapes the input into 2x2
space-to-depth form and rewrites the convs to operate on parity-stacked
channels:

    input  (B, H, W, 3)      --s2d-->  (B, H/2, W/2, 12)
    conv1  3x3/s2  3->64              3x3/s2 12->256   (output in s2d form)
    bn1+relu (per original channel)   parity-grouped BN on 256 lanes
    conv2  3x3/s2 64->64              2x2/s1 256->64   (output in plain form)

The rewritten kernels are *scattered views of the original 3x3 parameters*
(built inside the forward pass), so the parameter pytree, initialization,
gradients, and checkpoints are bit-identical to the vanilla stem; only the
compute schedule changes. Equivalence is asserted in
tests/models/test_s2d_stem.py.

Derivation of the tap maps: with s2d row r holding original rows (2r, 2r+1)
= (r, parity pi), an original-domain output row O = 2I + a (I the s2d output
row, a the output parity) reads original rows 2O + ki - 1; substituting gives
ki = 2*kt + pi - 2*a - 1 for conv1 (kt the s2d kernel tap, stride 2) and
ki = 2*kt + pi - 1 for conv2 (stride 1, plain output). Taps with ki outside
[0, 2] are structural zeros.
"""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..common import conv_kernel_init

Dtype = Any

__all__ = [
    "space_to_depth",
    "scatter_stem_conv1",
    "scatter_stem_conv2",
    "ParityGroupBatchNorm",
]


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """NHWC 2x2 space-to-depth with parity-major channel layout (di, dj, c)."""
    n, h, w, c = x.shape
    assert h % block == 0 and w % block == 0, (h, w)
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, block * block * c)


def scatter_stem_conv1(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cin,f) stride-2 kernel -> (3,3,4cin,4f) s2d-in/s2d-out kernel.

    Apply with stride 2 and padding ((1,0),(1,0)) on the s2d input; output
    channels are parity-major (a, b, f).
    """
    _, _, cin, f = w.shape
    ws = jnp.zeros((3, 3, 4 * cin, 4 * f), w.dtype)
    for a in range(2):
        for kt in range(3):
            for pi in range(2):
                ki = 2 * kt + pi - 2 * a - 1
                if not 0 <= ki <= 2:
                    continue
                for b in range(2):
                    for lt in range(3):
                        for pj in range(2):
                            kj = 2 * lt + pj - 2 * b - 1
                            if not 0 <= kj <= 2:
                                continue
                            pin, pout = pi * 2 + pj, a * 2 + b
                            ws = ws.at[
                                kt,
                                lt,
                                pin * cin : (pin + 1) * cin,
                                pout * f : (pout + 1) * f,
                            ].set(w[ki, kj])
    return ws


def scatter_stem_conv2(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cin,f) stride-2 kernel -> (2,2,4cin,f) s2d-in/plain-out kernel.

    Apply with stride 1 and padding ((1,0),(1,0)) on an s2d-form input whose
    underlying (2x-resolution) map is the conv's logical input.
    """
    _, _, cin, f = w.shape
    ws = jnp.zeros((2, 2, 4 * cin, f), w.dtype)
    for kt in range(2):
        for pi in range(2):
            ki = 2 * kt + pi - 1
            if not 0 <= ki <= 2:
                continue
            for lt in range(2):
                for pj in range(2):
                    kj = 2 * lt + pj - 1
                    if not 0 <= kj <= 2:
                        continue
                    pin = pi * 2 + pj
                    ws = ws.at[kt, lt, pin * cin : (pin + 1) * cin, :].set(
                        w[ki, kj]
                    )
    return ws


class ConvKernel(nn.Module):
    """Bare conv-kernel parameter with nn.Conv's pytree layout ({kernel})."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", conv_kernel_init, tuple(self.shape), jnp.float32)


class ParityGroupBatchNorm(nn.Module):
    """BatchNorm on an s2d-form tensor, exact vs plain BN on the un-s2d tensor.

    Input (..., P*C) with parity-major channels; batch statistics reduce over
    batch, space, AND the P parity groups, so they equal plain per-channel BN
    statistics of the underlying tensor. Variable names/shapes match
    nn.BatchNorm (params: scale/bias, batch_stats: mean/var, all (C,)).
    """

    parity: int = 4
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    stats_frac: float = 1.0
    grad_stats: str = "exact"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..common import _bn_train_stats, _bn_variables

        c = x.shape[-1] // self.parity
        scale, bias, ra_mean, ra_var = _bn_variables(self, c)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = max(1, int(round(x.shape[0] * self.stats_frac)))
            # parity groups fold into the reduction axis: stats equal plain
            # per-channel BN on the un-s2d tensor
            xs = x[:n].astype(jnp.float32).reshape(-1, c)
            mean, var = _bn_train_stats(self, xs, ra_mean, ra_var)
        inv = lax.rsqrt(var + self.epsilon) * scale
        mul = jnp.tile(inv, self.parity).astype(self.dtype)
        add = jnp.tile(bias - mean * inv, self.parity).astype(self.dtype)
        return x * mul + add


_DIMS = ("NHWC", "HWIO", "NHWC")


def s2d_stem_apply(
    x: jnp.ndarray,
    train: bool,
    dtype: Dtype,
    in_channels: int,
    stats_frac: float = 1.0,
    grad_stats: str = "exact",
) -> jnp.ndarray:
    """The s2d stem forward. Must be called from inside a parent module's
    compact ``__call__``; creates variables in that scope with the exact
    names/shapes of the vanilla stem (stem_conv1/stem_bn1/...)."""
    from ..common import batch_norm

    w1 = ConvKernel((3, 3, in_channels, 64), name="stem_conv1")()
    w2 = ConvKernel((3, 3, 64, 64), name="stem_conv2")()
    y = space_to_depth(x.astype(dtype))
    y = lax.conv_general_dilated(
        y,
        scatter_stem_conv1(w1).astype(dtype),
        window_strides=(2, 2),
        padding=((1, 0), (1, 0)),
        dimension_numbers=_DIMS,
    )
    y = ParityGroupBatchNorm(
        parity=4,
        use_running_average=not train,
        dtype=dtype,
        stats_frac=stats_frac,
        grad_stats=grad_stats,
        name="stem_bn1",
    )(y)
    y = nn.relu(y)
    y = lax.conv_general_dilated(
        y,
        scatter_stem_conv2(w2).astype(dtype),
        window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=_DIMS,
    )
    y = batch_norm(train, dtype, name="stem_bn2", stats_frac=stats_frac, grad_stats=grad_stats)(y)
    return nn.relu(y)


def depth_to_space(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (parity-major channel layout)."""
    n, h, w, c4 = x.shape
    c = c4 // (block * block)
    x = x.reshape(n, h, w, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, c)


def scatter_conv3x3_s1(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cin,f) stride-1 SAME kernel -> (3,3,4cin,4f) s2d->s2d kernel.

    A stride-1 3x3 conv on the plain tensor equals, on its 2x2
    space-to-depth form, a stride-1 3x3 conv with SAME padding whose kernel
    scatters the original taps: output parity (a, b) tap (t, l) input
    parity (pi, pj) reads W[ki, kj] with ki = 2t + pi - a - 1 and
    kj = 2l + pj - b - 1 (structural zeros outside [0, 2]). Same math, same
    params — 4x dense MACs but 128-lane-dense channels; whether that wins
    is shape-dependent (see tools/ablate_s2d_head.py).
    """
    _, _, cin, f = w.shape
    ws = jnp.zeros((3, 3, 4 * cin, 4 * f), w.dtype)
    for a in range(2):
        for b in range(2):
            for t in range(3):
                for pi in range(2):
                    ki = 2 * t + pi - a - 1
                    if not 0 <= ki <= 2:
                        continue
                    for l in range(3):
                        for pj in range(2):
                            kj = 2 * l + pj - b - 1
                            if not 0 <= kj <= 2:
                                continue
                            pin, pout = pi * 2 + pj, a * 2 + b
                            ws = ws.at[
                                t,
                                l,
                                pin * cin : (pin + 1) * cin,
                                pout * f : (pout + 1) * f,
                            ].set(w[ki, kj])
    return ws


def scatter_deconv4x4_s2(w: jnp.ndarray) -> jnp.ndarray:
    """(4,4,cin,f) ConvTranspose(k4,s2,SAME) kernel -> (3,3,cin,4f) kernel
    emitting the output directly in s2d form.

    lax.conv_transpose(k=4, s=2, SAME) satisfies out[o] = sum_j x[j]
    W[2j + 2 - o] per axis (delta-probe measured). In s2d output form,
    parity a at index I reads x[I - 1 + t] with tap W[2t - a]: parity 0
    spans j in {I-1, I}, parity 1 spans {I, I+1}, so the union needs a
    3-tap kernel with structural zeros (9/4 the minimal MACs — irrelevant
    for one layer, and MXU-dense). Apply with stride 1 and SAME padding
    ((1,1),(1,1)): identical math and params, but the 2x-resolution tensor
    is never materialized in plain layout.
    """
    _, _, cin, f = w.shape
    ws = jnp.zeros((3, 3, cin, 4 * f), w.dtype)
    for a in range(2):
        for b in range(2):
            for t in range(3):
                ki = 2 * t - a
                if not 0 <= ki <= 3:
                    continue
                for l in range(3):
                    kj = 2 * l - b
                    if not 0 <= kj <= 3:
                        continue
                    ws = ws.at[
                        t, l, :, (a * 2 + b) * f : (a * 2 + b + 1) * f
                    ].set(w[ki, kj])
    return ws


class S2DBasicBlock(nn.Module):
    """BasicBlock applied in 2x2 space-to-depth form — exact same math and
    parameter pytree as backbones.resnet.BasicBlock (stride 1, no
    downsample), for channel-narrow blocks at large spatial extents where
    C-in-lanes padding starves the conv backward (docs/performance.md,
    round-4 bottom-up campaign).

    Input/output are s2d-form NHWC (..., 4C) parity-major tensors.
    """

    channels: int
    dtype: Dtype = jnp.float32
    bn_stats_frac: float = 1.0
    bn_grad_stats: str = "exact"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        cin = x.shape[-1] // 4
        identity = x

        def pgbn(name):
            return ParityGroupBatchNorm(
                parity=4,
                use_running_average=not train,
                dtype=self.dtype,
                stats_frac=self.bn_stats_frac,
                grad_stats=self.bn_grad_stats,
                name=name,
            )

        w0 = ConvKernel((3, 3, cin, self.channels), name="Conv_0")()
        out = lax.conv_general_dilated(
            x, scatter_conv3x3_s1(w0).astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=_DIMS)
        out = pgbn("BatchNorm_0")(out)
        out = nn.relu(out)
        w1 = ConvKernel((3, 3, self.channels, self.channels), name="Conv_1")()
        out = lax.conv_general_dilated(
            out, scatter_conv3x3_s1(w1).astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=_DIMS)
        out = pgbn("BatchNorm_1")(out)
        return nn.relu(out + identity)


# adopt BasicBlock's auto-name so param/stat paths (BasicBlock_i.*) are
# identical and checkpoints interchange between plain and s2d head variants
S2DBasicBlock.__name__ = "BasicBlock"
S2DBasicBlock.__qualname__ = "BasicBlock"

"""Pallas fused 3x3 conv-chain (forward) — the VMEM-residency experiment.

Motivation: HRNet's 32-channel 3x3 stacks (branch-0 BasicBlocks, the
HigherHRNet head chain — ref mindpose/models/heads/higher_hrnet_head.py:72-230,
mindpose/models/backbones/hrnet.py:258-344) run at 15-28 TFLOP/s under XLA
because C=32 fills 32/128 MXU columns. The shipped space-to-depth rewrites
(models/common.py) fix the *lane density* at 4x MACs. The remaining untested
lever is *schedule*: fuse the whole chain in VMEM so inter-conv activations
never round-trip HBM, and feed the MXU im2col-style (K = 9*C = 288 dense
contraction rows instead of 9 separate K=32 dots).

Hypothesis bounds (v5e, bf16 peak ~197 TFLOP/s, HBM ~819 GB/s):
- lane ceiling: N = C = 32 output lanes -> at most 25% of peak ~ 49 TFLOP/s
  regardless of schedule, vs XLA's measured 15-28 -> up to ~2x headroom.
- HBM traffic: XLA writes+reads every intermediate (2 tensors/conv); the
  fused chain does one read + one write total, saving (L-1)/L of traffic.

This is a go/no-go measurement kernel (tools/ablate_pallas_chain.py), not a
production path: forward-only, stride 1, SAME zero padding, square-ish
images, ReLU epilogue — exactly the probe protocol of
tools/ablate_conv_chain.py.

Kernel layout: grid over batch; two zero-bordered (H+2, W+2, C) bf16
ping-pong buffers in VMEM; per conv, a fori_loop over S-row strips builds
the (S*W, 9C) im2col block from 9 static taps of the padded buffer and runs
one MXU dot against the conv's (9C, C) matrix with f32 accumulation.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain_kernel(x_ref, w_ref, o_ref, buf_a, buf_b, im2_ref, *, depth,
                  strip):
    H, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    # zero the padded borders once; interiors are fully overwritten per conv
    buf_a[:] = jnp.zeros_like(buf_a)
    buf_b[:] = jnp.zeros_like(buf_b)
    buf_a[1:1 + H, 1:1 + W, :] = x_ref[0]

    bufs = [buf_a, buf_b]
    n_strips = H // strip
    for layer in range(depth):
        src, dst = bufs[layer % 2], bufs[(layer + 1) % 2]
        w_l = w_ref[layer]  # (9C, C)

        def strip_body(s, _, src=src, dst=dst, w_l=w_l):
            r = s * strip
            # (strip+2, W+2, C) window covering the strip's halo
            win = src[pl.ds(r, strip + 2), :, :]
            # stage the 9 shifted taps through VMEM scratch: Mosaic cannot
            # concatenate vectors whose layouts carry the taps' differing
            # sublane/lane offsets ("offset mismatch on non-concat
            # dimension"); stores re-lay each tap at offset zero
            for i, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                         for dx in range(3)):
                im2_ref[:, :, i * C:(i + 1) * C] = \
                    win[dy:dy + strip, dx:dx + W, :]
            im2col = im2_ref[:].reshape(strip * W, 9 * C)
            acc = jnp.dot(im2col, w_l, preferred_element_type=jnp.float32)
            out = jnp.maximum(acc, 0.0).astype(src.dtype)
            dst[pl.ds(r + 1, strip), 1:1 + W, :] = out.reshape(strip, W, C)
            return 0

        jax.lax.fori_loop(0, n_strips, strip_body, 0)

    o_ref[0] = bufs[depth % 2][1:1 + H, 1:1 + W, :]


@functools.partial(jax.jit, static_argnames=("strip", "interpret"))
def fused_conv_chain(x: jax.Array, weights: jax.Array,
                     strip: int = 16, interpret: bool = False) -> jax.Array:
    """L x (3x3 SAME conv + ReLU) with all intermediates VMEM-resident.

    Args:
        x: (B, H, W, C) activations (bf16 recommended); H % strip == 0.
        weights: (L, 3, 3, C, C) HWIO conv kernels.
        strip: rows per im2col matmul block.

    Returns (B, H, W, C), numerically matching the XLA lax.conv chain up to
    bf16 accumulation-order differences.
    """
    B, H, W, C = x.shape
    L = weights.shape[0]
    if H % strip:
        raise ValueError(f"H={H} not divisible by strip={strip}")
    w2 = weights.reshape(L, 9 * C, C)  # (dy, dx, ci) contiguous -> K rows
    flops = 2 * B * H * W * 9 * C * C * L
    return pl.pallas_call(
        functools.partial(_chain_kernel, depth=L, strip=strip),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 9 * C, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, C), x.dtype),
            pltpu.VMEM((H + 2, W + 2, C), x.dtype),
            pltpu.VMEM((strip, W, 9 * C), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, w2)


def xla_conv_chain(x: jax.Array, weights: jax.Array) -> jax.Array:
    """The same chain via per-conv lax.conv — the parity/timing baseline."""
    for layer in range(weights.shape[0]):
        x = jax.lax.conv_general_dilated(
            x, weights[layer], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)
    return x

"""Probe layout/channel-count dependence of the conv-backward slowdown.

ablate_conv_bwd.py showed fwd+bwd of an 8x 3x3 conv chain at constant
pixels degrades ~2x once a spatial dim reaches 128 (dx path dominates,
dw nearly free, f32 worse than bf16). Here: is it C-dependent (C=32 pads
4x in lanes) and does an NCHW layout (W exactly in lanes) change it?
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()
import jax
import jax.numpy as jnp
import numpy as np

from mindpose_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

rng = np.random.RandomState(0)
DEPTH = 8


def timeit(f, args, iters=10):
    o = f(*args)
    _ = float(np.asarray(o))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _ = float(np.asarray(o))
    return (time.perf_counter() - t0) / iters * 1000


def run(tag, b, h, w_, c, layout="NHWC", dt=jnp.bfloat16):
    if layout == "NHWC":
        shape = (b, h, w_, c)
        dn = ("NHWC", "HWIO", "NHWC")
        kshape = (3, 3, c, c)
    else:
        shape = (b, c, h, w_)
        dn = ("NCHW", "OIHW", "NCHW")
        kshape = (c, c, 3, 3)
    x = jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(dt)
    ks = tuple(
        jnp.asarray(rng.rand(*kshape).astype(np.float32) * 0.1).astype(dt)
        for _ in range(DEPTH))

    def chain(x, ks):
        for k in ks:
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=dn)
            x = jax.nn.relu(x)
        return x

    def loss(x, ks):
        return jnp.sum(chain(x, ks).astype(jnp.float32))

    f = jax.jit(lambda x, ks: sum(
        jnp.vdot(g.astype(jnp.float32), g.astype(jnp.float32))
        for g in jax.tree_util.tree_leaves(
            jax.grad(loss, argnums=(0, 1))(x, ks))))
    fwd = jax.jit(lambda x, ks: jnp.vdot(
        chain(x, ks).astype(jnp.float32), chain(x, ks).astype(jnp.float32)))
    ms = timeit(f, (x, ks))
    ms_f = timeit(fwd, (x, ks))
    mpix = b * h * w_ / 1e6
    print(f"{tag:34s} fwd2x {ms_f:7.2f} ms  fwd+bwd {ms:7.2f} ms "
          f"{ms/mpix:7.3f} ms/Mpix", flush=True)


# C=32, NHWC: the known fast/slow pair
run("C32 NHWC B96 64x64", 96, 64, 64, 32)
run("C32 NHWC B24 128x128", 24, 128, 128, 32)
# NCHW at the same shapes
run("C32 NCHW B96 64x64", 96, 64, 64, 32, layout="NCHW")
run("C32 NCHW B24 128x128", 24, 128, 128, 32, layout="NCHW")
# C=128: does full-lane channel count remove the pathology?
run("C128 NHWC B24 64x64", 24, 64, 64, 128)
run("C128 NHWC B6 128x128", 6, 128, 128, 128)
# C=64 (stage-2/3 branch widths)
run("C64 NHWC B48 64x64", 48, 64, 64, 64)
run("C64 NHWC B12 128x128", 12, 128, 128, 64)
# batch sensitivity at the slow shape (latency- vs throughput-bound?)
run("C32 NHWC B48 128x128", 48, 128, 128, 32)
run("C32 NHWC B96 128x128", 96, 128, 128, 32)
# round-4 follow-up: is s2d worth it for branch-1 (C=64) chains?
# plain C64 at bottom-up branch-1 geometry vs its s2d form (C256, 4x MACs)
run("C64 NHWC B24 64x64 (branch1)", 24, 64, 64, 64)
run("C256 NHWC B24 32x32 (b1 s2d)", 24, 32, 32, 256)
run("C64 NHWC B24 128x128", 24, 128, 128, 64)
run("C256 NHWC B24 64x64", 24, 64, 64, 256)
# stage-1 bottleneck 3x3 geometry (C64 at 128x128 is its s2d-candidate)

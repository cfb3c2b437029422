"""Conv-chain shape sensitivity: reproduce the 512-shape slowdown minimally.

Single convs are dispatch-floored (~3 ms) over the tunnel; a chain of 8
3x3 convs amortizes that and exposes per-conv cost. Shapes compare the
top-down branch-0 geometry (B128 64x48) against the bottom-up one
(B24 128x128) at equal total pixels, plus layout/batch-folding variants to
find what XLA tiles badly.
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


def chain(x, ks, relu=True):
    for k in ks:
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if relu:
            x = jax.nn.relu(x)
    return x


def run(tag, b, h, w_, c, bwd=True):
    x = jnp.asarray(rng.rand(b, h, w_, c).astype(np.float32)).astype(jnp.bfloat16)
    ks = tuple(
        jnp.asarray(rng.rand(3, 3, c, c).astype(np.float32) * 0.1).astype(jnp.bfloat16)
        for _ in range(DEPTH))

    def loss(x, ks):
        return jnp.sum(chain(x, ks).astype(jnp.float32))

    if bwd:
        f = jax.jit(lambda x, ks: sum(
            jnp.vdot(g.astype(jnp.float32), g.astype(jnp.float32))
            for g in jax.tree_util.tree_leaves(
                jax.grad(loss, argnums=(0, 1))(x, ks))))
    else:
        f = jax.jit(loss)
    ms = timeit(f, (x, ks))
    gflop = 2 * b * h * w_ * 9 * c * c * DEPTH * (3 if bwd else 1) / 1e9
    print(f"{tag:34s} C={c:<4d} {'fwd+bwd' if bwd else 'fwd    '}"
          f" {ms:8.2f} ms  {gflop/ms:6.1f} TFLOP/s", flush=True)


for c in (32, 64):
    run("B128 64x48 (topdown geom)", 128, 64, 48, c, bwd=False)
    run("B24  128x128 (bottomup geom)", 24, 128, 128, c, bwd=False)
    run("B128 64x48 (topdown geom)", 128, 64, 48, c)
    run("B24  128x128 (bottomup geom)", 24, 128, 128, c)
# batch-folding variants at C=32 (inexact semantics; pure layout probes)
run("B48  64x128 (H folded to batch)", 48, 64, 128, 32)
run("B96  64x64  (HW folded)", 96, 64, 64, 32)
run("B24  256x256 (bottomup 2x geom)", 24, 256, 256, 32)
run("B384 32x24  (topdown /2 geom)", 384, 32, 24, 32)

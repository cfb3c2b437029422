"""Single-conv shape sensitivity: is the bottom-up slowdown generic?

The HRNet backbone at B24 512x512 runs 2.5x slower than at B128 256x192
(equal pixels, equal FLOPs, eval-BN) with bytes-accessed ~ proportional to
H. This microbenchmark times one 3x3 conv (fwd, fwd+bwd, and the two
backward halves separately) across equal-pixel shapes and channel widths to
find where the blowup lives (conv fwd / dgrad / wgrad, channel width,
spatial extent).
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


def timeit(f, args, iters=10):
    o = f(*args)
    _ = float(np.asarray(o))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _ = float(np.asarray(o))
    return (time.perf_counter() - t0) / iters * 1000


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def run(tag, b, h, w_, c):
    x = jnp.asarray(rng.rand(b, h, w_, c).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.rand(3, 3, c, c).astype(np.float32)).astype(jnp.bfloat16)

    fwd = jax.jit(lambda x, k: jnp.sum(conv(x, k).astype(jnp.float32)))

    def loss(x, k):
        return jnp.sum(conv(x, k).astype(jnp.float32))

    both = jax.jit(lambda x, k: sum(
        jnp.vdot(g.astype(jnp.float32), g.astype(jnp.float32))
        for g in jax.grad(loss, argnums=(0, 1))(x, k)))
    dx_only = jax.jit(lambda x, k: jnp.vdot(
        jax.grad(loss, argnums=0)(x, k).astype(jnp.float32),
        jax.grad(loss, argnums=0)(x, k).astype(jnp.float32)) * 0.5)
    dw_only = jax.jit(lambda x, k: jnp.vdot(
        jax.grad(loss, argnums=1)(x, k).astype(jnp.float32),
        jax.grad(loss, argnums=1)(x, k).astype(jnp.float32)) * 0.5)

    ms_f = timeit(fwd, (x, k))
    ms_b = timeit(both, (x, k))
    ms_dx = timeit(dx_only, (x, k))
    ms_dw = timeit(dw_only, (x, k))
    print(f"{tag:28s} C={c:<4d} fwd {ms_f:7.2f}  fwd+bwd {ms_b:7.2f}"
          f"  fwd+dx {ms_dx:7.2f}  fwd+dw {ms_dw:7.2f}", flush=True)


for c in (32, 64, 128):
    run("B128 64x48 (topdown s1)", 128, 64, 48, c)
    run("B24  128x128 (bottomup s1)", 24, 128, 128, c)
for c in (32,):
    run("B128 128x96 (topdown 2x)", 128, 128, 96, c)
    run("B24  256x256 (bottomup 2x)", 24, 256, 256, c)

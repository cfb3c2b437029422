"""Narrow the conv-backward shape pathology: which half, W threshold, dtype.

ablate_conv_chain.py showed 8-conv chains backward ~2x slower when W >= 128
at equal pixels (fwd unaffected). This probes dx-only vs dw-only, a W sweep
at constant pixels, W-folding into batch, and f32 vs bf16.
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
C = 32


def timeit(f, args, iters=10):
    o = f(*args)
    _ = float(np.asarray(o))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _ = float(np.asarray(o))
    return (time.perf_counter() - t0) / iters * 1000


def chain(x, ks):
    for k in ks:
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)
    return x


def run(tag, b, h, w_, dt=jnp.bfloat16, grad_of="both"):
    x = jnp.asarray(rng.rand(b, h, w_, C).astype(np.float32)).astype(dt)
    ks = tuple(
        jnp.asarray(rng.rand(3, 3, C, C).astype(np.float32) * 0.1).astype(dt)
        for _ in range(DEPTH))

    def loss(x, ks):
        return jnp.sum(chain(x, ks).astype(jnp.float32))

    argnums = {"both": (0, 1), "dx": 0, "dw": 1}[grad_of]
    f = jax.jit(lambda x, ks: sum(
        jnp.vdot(g.astype(jnp.float32), g.astype(jnp.float32))
        for g in jax.tree_util.tree_leaves(
            jax.grad(loss, argnums=argnums)(x, ks))))
    ms = timeit(f, (x, ks))
    mpix = b * h * w_ / 1e6
    print(f"{tag:36s} grad={grad_of:4s} {ms:8.2f} ms   {ms/mpix:6.3f} ms/Mpix",
          flush=True)


# which backward half blows up at the 128x128 shape?
run("B24 128x128 bf16", 24, 128, 128, grad_of="dx")
run("B24 128x128 bf16", 24, 128, 128, grad_of="dw")
run("B128 64x48 bf16", 128, 64, 48, grad_of="dx")
run("B128 64x48 bf16", 128, 64, 48, grad_of="dw")
# W sweep at constant pixels (fold the rest into batch)
for (b, h, w_) in [(96, 64, 64), (48, 64, 128), (24, 64, 256),
                   (48, 128, 64), (24, 128, 128), (12, 128, 256)]:
    run(f"B{b} {h}x{w_} bf16", b, h, w_)
# dtype
run("B24 128x128 f32", 24, 128, 128, dt=jnp.float32)

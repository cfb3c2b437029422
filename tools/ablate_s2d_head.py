"""Proxy ablation: space-to-depth channel packing for the HigherHRNet head.

ablate_conv_layout.py showed C=32 conv chains run at ~15-28 TFLOP/s fwd+bwd
while C=128 runs at 61-109 — the bottom-up step's pathology is narrow
channels, not spatial size. The head's 9-conv 256x256x32 chain is the worst
sequential case. Candidate exact rewrites, timed here as proxies (same
pixels/params math, s2d kernels random rather than scattered):

  plain      8x conv3x3 C32 @ 256x256        (1.00x FLOPs, the status quo)
  s2d_dense  8x conv3x3 C128 @ 128x128       (4.00x FLOPs, structural zeros)
  s2d_parity 8x [4 parity conv2x2 4C->C]     (1.78x FLOPs, minimal rewrite)
  *_conv     same plus s2d/inverse transposes at the chain ends

Decision rule: ship whichever beats plain by the most wall-clock.
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

from mindpose_tpu.models.backbones.s2d import space_to_depth

rng = np.random.RandomState(0)
B, H, W, C = int(os.environ.get("S2D_B", 24)), 256, 256, 32
DEPTH = 8
DT = jnp.bfloat16


def depth_to_space(x, block=2):
    n, h, w, c4 = x.shape
    c = c4 // (block * block)
    x = x.reshape(n, h, w, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, c)


def timeit(f, args, iters=10):
    o = f(*args)
    _ = float(np.asarray(o))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _ = float(np.asarray(o))
    return (time.perf_counter() - t0) / iters * 1000


def conv(x, k, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def report(tag, f, args, flops_x):
    ms = timeit(f, args)
    base_gflop = 2 * B * H * W * 9 * C * C * DEPTH * 3 / 1e9
    print(f"{tag:34s} {ms:8.2f} ms   {flops_x:4.2f}x FLOPs "
          f"({base_gflop * flops_x / ms:6.1f} TF/s achieved)", flush=True)


x_plain = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(DT)
ks3 = tuple(jnp.asarray(rng.rand(3, 3, C, C).astype(np.float32) * 0.1).astype(DT)
            for _ in range(DEPTH))
ks3_s2d = tuple(jnp.asarray(rng.rand(3, 3, 4 * C, 4 * C).astype(np.float32) * 0.1)
                .astype(DT) for _ in range(DEPTH))
# four parity kernels per layer (2x2, 4C -> C each)
ks2_par = tuple(
    tuple(jnp.asarray(rng.rand(2, 2, 4 * C, C).astype(np.float32) * 0.1).astype(DT)
          for _ in range(4))
    for _ in range(DEPTH))


def loss_of(chain_fn):
    def lf(x, ks):
        return jnp.sum(chain_fn(x, ks).astype(jnp.float32))

    return jax.jit(lambda x, ks: sum(
        jnp.vdot(g.astype(jnp.float32), g.astype(jnp.float32))
        for g in jax.tree_util.tree_leaves(
            jax.grad(lf, argnums=(0, 1))(x, ks))))


def chain_plain(x, ks):
    for k in ks:
        x = jax.nn.relu(conv(x, k))
    return x


def chain_dense(x, ks):
    for k in ks:
        x = jax.nn.relu(conv(x, k))
    return x


def chain_parity(x, ks):
    # per layer: 4 output-parity convs with one-sided 2x2 padding, then
    # interleave as s2d channels (proxy: concat, parity order irrelevant
    # for timing)
    for quad in ks:
        outs = []
        for i, (pa, pb) in enumerate(((1, 0), (0, 1))):
            for j, (qa, qb) in enumerate(((1, 0), (0, 1))):
                o = jax.lax.conv_general_dilated(
                    x, quad[i * 2 + j], (1, 1),
                    ((pa, pb), (qa, qb)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                outs.append(o)
        x = jax.nn.relu(jnp.concatenate(outs, axis=-1))
    return x


def chain_dense_conv(x, ks):
    x = space_to_depth(x)
    x = chain_dense(x, ks)
    return depth_to_space(x)


def chain_parity_conv(x, ks):
    x = space_to_depth(x)
    x = chain_parity(x, ks)
    return depth_to_space(x)


x_s2d = space_to_depth(x_plain)
report("plain 3x3 C32 256x256", loss_of(chain_plain), (x_plain, ks3), 1.0)
report("s2d dense 3x3 C128 128x128", loss_of(chain_dense), (x_s2d, ks3_s2d), 4.0)
report("s2d parity 4x2x2 128x128", loss_of(chain_parity), (x_s2d, ks2_par), 16 / 9)
report("s2d dense + convert ends", loss_of(chain_dense_conv), (x_plain, ks3_s2d), 4.0)
report("s2d parity + convert ends", loss_of(chain_parity_conv), (x_plain, ks2_par), 16 / 9)

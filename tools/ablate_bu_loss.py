"""Isolate the bottom-up masked-MSE cost: layout/padding/dtype variants.

Measurement note (important): every jitted function here reduces its
gradient to ONE scalar on device before returning. Fetching a full grad
array as the sync barrier ships tens of MB over the ~25 MB/s axon tunnel
and swamps the measurement (the first cut of this tool — and the loss-part
rows of ablate_bottomup.py's original run — made exactly that mistake).
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

B, K = int(os.environ.get("B", 24)), 17
rng = np.random.RandomState(0)


def gnorm(tree):
    """Reduce a grad tree to one scalar on device (cheap, DCE-proof)."""
    return sum(jnp.vdot(g.astype(jnp.float32), g.astype(jnp.float32))
               for g in jax.tree_util.tree_leaves(tree))


def timeit(f, args, iters=10):
    o = f(*args)
    _ = float(np.asarray(o))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _ = float(np.asarray(o))
    return (time.perf_counter() - t0) / iters * 1000


def run(name, fn, *args):
    f = jax.jit(fn)
    ms = timeit(f, args)
    try:
        c = f.lower(*args).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        gb = c.get("bytes accessed", 0) / 1e9
    except Exception:
        gb = float("nan")
    print(f"{name:42s} {ms:8.2f} ms   {gb:7.2f} GB", flush=True)


t1 = jnp.asarray(rng.rand(B, 256, 256, K).astype(np.float32))
m1 = jnp.asarray(np.ones((B, 256, 256), np.float32))
p1 = jnp.asarray(rng.rand(B, 256, 256, K).astype(np.float32)).astype(jnp.bfloat16)


def mse_masked(p, t, m):
    def lf(p):
        d = jnp.square(p.astype(jnp.float32) - t)
        return jnp.mean(d * m[..., None])
    return gnorm(jax.grad(lf)(p))

run("masked mse lvl1 [B,256,256,17] f32 tgt", mse_masked, p1, t1, m1)
run("masked mse lvl1, bf16 target", mse_masked, p1,
    t1.astype(jnp.bfloat16), m1)


def mse_plain(p, t):
    def lf(p):
        return jnp.mean(jnp.square(p.astype(jnp.float32) - t))
    return gnorm(jax.grad(lf)(p))

run("plain mse lvl1 (no mask)", mse_plain, p1, t1)

t1p = jnp.asarray(rng.rand(B, 256, 256, 128).astype(np.float32))
p1p = jnp.asarray(
    rng.rand(B, 256, 256, 128).astype(np.float32)).astype(jnp.bfloat16)
run("plain mse lvl1 K=128", mse_plain, p1p, t1p)

t1c = jnp.asarray(rng.rand(B, K, 256, 256).astype(np.float32))
p1c = jnp.asarray(
    rng.rand(B, K, 256, 256).astype(np.float32)).astype(jnp.bfloat16)
run("plain mse lvl1 [B,K,H,W] (K major)", mse_plain, p1c, t1c)

t1f = t1.reshape(B, 256, 256 * K)
p1f = p1.reshape(B, 256, 256 * K)
run("plain mse lvl1 folded [B,256,256*17]", mse_plain, p1f, t1f)


def red(t):
    def lf(t):
        return jnp.mean(jnp.square(t))
    return gnorm(jax.grad(lf)(t))

run("grad mean(sq(t)) same tensor", red, t1)

# the real padded two-level layout from the step
S = 2
tgt = jnp.asarray(rng.rand(B, S, 256, 256, K).astype(np.float32))
msk = jnp.asarray(np.ones((B, S, 256, 256), np.float32))
p0 = jnp.asarray(
    rng.rand(B, 128, 128, 2 * K).astype(np.float32)).astype(jnp.bfloat16)


def mse_two_level(p0, p1, tgt, msk):
    def lf(ps):
        p0_, p1_ = ps
        l0 = jnp.square(p0_[..., :K].astype(jnp.float32)
                        - tgt[:, 0, :128, :128, :]) * msk[:, 0, :128, :128, None]
        l1 = jnp.square(p1_.astype(jnp.float32) - tgt[:, 1]) * msk[:, 1][..., None]
        return jnp.mean(l0) + jnp.mean(l1)
    return gnorm(jax.grad(lf)((p0, p1)))

run("two-level padded (step layout)", mse_two_level, p0, p1, tgt, msk)

# AE loss standalone, scalarized
from mindpose_tpu.models.loss.ae import AELoss

ae_c = AELoss()
M = 30
tag_ind_np = np.zeros((B, M, K, 2), np.int32)
tag_ind_np[..., 0] = rng.randint(0, 128 * 128, (B, M, K))
tag_ind_np[..., 1] = rng.randint(0, 2, (B, M, K))
tag_ind = jnp.asarray(tag_ind_np)
p0t = jnp.asarray(
    rng.rand(B, 128, 128, 2 * K).astype(np.float32)).astype(jnp.bfloat16)


def ae_fwdbwd(p0, tag_ind):
    def lf(p0):
        push, pull = ae_c(p0[..., K:], tag_ind) * 0.001
        return push + pull
    return gnorm(jax.grad(lf)(p0))

run("ae loss fwd+bwd (scalarized)", ae_fwdbwd, p0t, tag_ind)

# full ae_multi_loss as the step uses it, scalarized
import mindpose_tpu as mp

loss = mp.create_loss(
    "ae_multi_loss", num_joints=K, num_stages=2,
    stage_sizes=[[128, 128], [256, 256]],
    mse_loss_factor=[1.0, 1.0], ae_loss_factor=[0.001, 0.001],
    with_mse_loss=[True, True], with_ae_loss=[True, False],
)
tag_full_np = np.zeros((B, 2, M, K, 2), np.int32)
tag_full_np[..., 0] = rng.randint(0, 128 * 128, (B, 2, M, K))
tag_full_np[..., 1] = rng.randint(0, 2, (B, 2, M, K))
tag_full = jnp.asarray(tag_full_np)


def full_loss_fwdbwd(p0, p1, tgt, msk, tag_full):
    def lf(ps):
        return jnp.sum(loss(ps, tgt, msk, tag_full))
    return gnorm(jax.grad(lf)((p0, p1)))

run("ae_multi_loss fwd+bwd (scalarized)", full_loss_fwdbwd,
    p0, p1, tgt, msk, tag_full)

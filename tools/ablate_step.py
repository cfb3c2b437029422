"""Ablation timing of the real HRNet-W32 train step.

Variants isolate where the 87ms goes: forward-only, eval-mode BN (no batch
stats), no-head, fwd+bwd without optimizer. Chained dispatch + scalar fetch
(the proven-consistent methodology from tools/profile_parts.py).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()
import jax, jax.numpy as jnp, numpy as np
import optax
from mindpose_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import mindpose_tpu as mp
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.parallel import build_train_step, create_train_state

B = 128
net = mp.create_network("hrnet_w32", "hrnet_head", dtype=jnp.bfloat16)
loss = mp.create_loss("joint_mse", use_target_weight=True)
nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)

image = jnp.zeros((1, 256, 192, 3), jnp.float32)
variables = net.init(jax.random.PRNGKey(0), image, train=False)
params, stats = variables["params"], variables["batch_stats"]
tx = create_optimizer(params, "adamw", learning_rate=1e-3, weight_decay=0.05)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, 256, 192, 3).astype(np.float32))
y = jnp.asarray(rng.rand(B, 64, 48, 17).astype(np.float32))
w = jnp.ones((B, 17), jnp.float32)

def timeit(f, args, iters=20, fetch=lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]):
    o = f(*args); _ = fetch(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _ = fetch(o)
    return (time.perf_counter() - t0) / iters * 1000

# 1. full train step (reference point)
state = create_train_state(variables, tx)
step = build_train_step(nwl, tx, mesh=None, donate=False)
ms_full = timeit(jax.jit(lambda s: step(s, x, y, w)), (state,))
print(f"full step (fwd+bwd+opt)      {ms_full:8.2f} ms")

# 2. fwd-only train-mode (stats computed, loss returned)
@jax.jit
def fwd(params, stats):
    out, _ = nwl.apply({"params": params, "batch_stats": stats}, x, y, w)
    return jnp.sum(out)
print(f"fwd only (train BN)          {timeit(fwd, (params, stats)):8.2f} ms")

# 3. fwd+bwd, no optimizer
@jax.jit
def fwdbwd(params, stats):
    def lf(p):
        out, _ = nwl.apply({"params": p, "batch_stats": stats}, x, y, w)
        return jnp.sum(out)
    return jax.grad(lf)(params)
print(f"fwd+bwd (no opt)             {timeit(fwdbwd, (params, stats)):8.2f} ms")

# 4. fwd+bwd with BN in EVAL mode (no batch-stat reductions)
@jax.jit
def fwdbwd_eval(params, stats):
    def lf(p):
        hm = net.apply({"params": p, "batch_stats": stats}, x, train=False)
        return jnp.sum(loss(hm.astype(jnp.float32), y, w))
    return jax.grad(lf)(params)
print(f"fwd+bwd (eval BN, no stats)  {timeit(fwdbwd_eval, (params, stats)):8.2f} ms")

# 5. fwd-only eval mode
@jax.jit
def fwd_eval(params, stats):
    hm = net.apply({"params": params, "batch_stats": stats}, x, train=False)
    return jnp.sum(hm.astype(jnp.float32))
print(f"fwd only (eval BN)           {timeit(fwd_eval, (params, stats)):8.2f} ms")

"""Ablation timing of the real HigherHRNet-W32 512x512 train step (batch 24).

Decomposes the bottom-up step the way tools/ablate_step.py does for the
top-down flagship: full step, fwd/bwd splits, eval-mode BN, then the
bottom-up-specific parts — backbone vs head vs loss (mse / ae split), and a
padded-vs-exact-size target-layout variant of the loss. Chained dispatch +
single scalar fetch (the only reliable barrier over the axon tunnel).
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

import mindpose_tpu as mp
from mindpose_tpu.models.loss.ae import AELoss
from mindpose_tpu.models.loss.mse import JointsMSELossWithMask
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.parallel import build_train_step, create_train_state

B = int(os.environ.get("ABLATE_BU_BATCH", 24))
K, M = 17, 30

# ABLATE_BU_VARIANT: "base" (round-3 layout) or "opt" (round-4 shipped
# config: s2d head + branch0_s2d backbone + fused BN)
_OPT = os.environ.get("ABLATE_BU_VARIANT", "opt") == "opt"
net = mp.create_network(
    "hrnet_w32", "higher_hrnet_head", dtype=jnp.bfloat16,
    backbone_args=(
        {"branch0_s2d": True, "bn_grad_stats": "fused"} if _OPT else {}),
    head_args={"with_ae_loss": (True, False),
               "s2d_refine": _OPT},
)
loss = mp.create_loss(
    "ae_multi_loss", num_joints=K, num_stages=2,
    stage_sizes=[[128, 128], [256, 256]],
    mse_loss_factor=[1.0, 1.0], ae_loss_factor=[0.001, 0.001],
    with_mse_loss=[True, True], with_ae_loss=[True, False],
)
nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)

image = jnp.zeros((1, 512, 512, 3), jnp.float32)
variables = net.init(jax.random.PRNGKey(0), image, train=False)
params, stats = variables["params"], variables["batch_stats"]
tx = create_optimizer(params, "adam", learning_rate=1e-3)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
target = jnp.asarray(rng.rand(B, 2, 256, 256, K).astype(np.float32))
mask = jnp.ones((B, 2, 256, 256), jnp.float32)
tag_ind_np = np.zeros((B, 2, M, K, 2), np.int32)
tag_ind_np[..., 0] = rng.randint(0, 128 * 128, (B, 2, M, K))
tag_ind_np[..., 1] = rng.randint(0, 2, (B, 2, M, K))
tag_ind = jnp.asarray(tag_ind_np)


def gnorm(tree):
    """Reduce any output tree to ONE on-device scalar.

    The sync fetch must be 4 bytes: fetching a grad ARRAY as the barrier
    ships tens of MB over the ~25 MB/s axon tunnel and swamps the
    measurement (this tool's first run reported the loss parts at ~260 ms
    that way; they are ~4 ms — see ablate_bu_loss.py).
    """
    return sum(jnp.vdot(g.astype(jnp.float32), g.astype(jnp.float32))
               for g in jax.tree_util.tree_leaves(tree))


def timeit(f, args, iters=10,
           fetch=lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]):
    o = f(*args)
    _ = fetch(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _ = fetch(o)
    return (time.perf_counter() - t0) / iters * 1000


# 1. full train step (the 363 ms reference point from round 3)
# NOTE: data arrays are passed as ARGUMENTS everywhere in this file — closing
# over them bakes ~300 MB of literals into the HLO, which the axon
# remote-compile endpoint rejects (HTTP 413).
state = create_train_state(variables, tx)
step = build_train_step(nwl, tx, mesh=None, donate=False)
ms_full = timeit(step, (state, x, target, mask, tag_ind))
print(f"full step (fwd+bwd+opt)        {ms_full:8.2f} ms"
      f"  ({B / ms_full * 1000:6.1f} img/s)")

try:
    cost = step.lower(state, x, target, mask, tag_ind).compile().cost_analysis()
    if cost:
        c = cost[0] if isinstance(cost, (list, tuple)) else cost
        print(f"  XLA cost: {c.get('flops', 0)/1e12:.2f} TFLOP, "
              f"{c.get('bytes accessed', 0)/1e9:.1f} GB accessed")
except Exception as e:
    print(f"  (cost analysis unavailable: {e!r})")

# 2. fwd only (train BN)
@jax.jit
def fwd(params, stats, x, target, mask, tag_ind):
    out, _ = nwl.apply({"params": params, "batch_stats": stats},
                       x, target, mask, tag_ind)
    return jnp.sum(out)
print(f"fwd only (train BN)            "
      f"{timeit(fwd, (params, stats, x, target, mask, tag_ind)):8.2f} ms")

# 3. fwd+bwd, no optimizer
@jax.jit
def fwdbwd(params, stats, x, target, mask, tag_ind):
    def lf(p):
        out, _ = nwl.apply({"params": p, "batch_stats": stats},
                           x, target, mask, tag_ind)
        return jnp.sum(out)
    return gnorm(jax.grad(lf)(params))
print(f"fwd+bwd (no opt)               "
      f"{timeit(fwdbwd, (params, stats, x, target, mask, tag_ind)):8.2f} ms")

# 4. fwd+bwd with BN in EVAL mode (no batch-stat reductions)
@jax.jit
def fwdbwd_eval(params, stats, x, target, mask, tag_ind):
    def lf(p):
        preds = net.apply({"params": p, "batch_stats": stats}, x, train=False)
        return jnp.sum(loss(preds, target, mask, tag_ind))
    return gnorm(jax.grad(lf)(params))
print(f"fwd+bwd (eval BN)              "
      f"{timeit(fwdbwd_eval, (params, stats, x, target, mask, tag_ind)):8.2f} ms")

# 5. backbone only, fwd+bwd (train BN)
backbone = net.backbone
bvars = backbone.init(jax.random.PRNGKey(0), image, train=False)
@jax.jit
def bb_fwdbwd(p, s, x):
    def lf(p):
        feat, newv = backbone.apply(
            {"params": p, "batch_stats": s}, x, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(feat.astype(jnp.float32))
    return gnorm(jax.grad(lf)(p))
print(f"backbone only fwd+bwd          "
      f"{timeit(bb_fwdbwd, (bvars['params'], bvars['batch_stats'], x)):8.2f} ms")

# 6. head only, fwd+bwd (feed fixed stage-4 features)
head = net.head
feat = jnp.asarray(rng.rand(B, 128, 128, 32).astype(np.float32))
hvars = head.init(jax.random.PRNGKey(0), feat[:1], train=False)
@jax.jit
def head_fwdbwd(p, s, feat):
    def lf(p):
        preds, newv = head.apply(
            {"params": p, "batch_stats": s}, feat, train=True,
            mutable=["batch_stats"],
        )
        return sum(jnp.sum(o.astype(jnp.float32)) for o in preds)
    return gnorm(jax.grad(lf)(p))
print(f"head only fwd+bwd              "
      f"{timeit(head_fwdbwd, (hvars['params'], hvars['batch_stats'], feat)):8.2f} ms")

# 7. loss only, grad wrt preds (bf16 preds like the net emits)
pred0 = jnp.asarray(rng.rand(B, 128, 128, 2 * K).astype(np.float32)).astype(jnp.bfloat16)
pred1 = jnp.asarray(rng.rand(B, 256, 256, K).astype(np.float32)).astype(jnp.bfloat16)

@jax.jit
def loss_fwdbwd(pred0, pred1, target, mask, tag_ind):
    def lf(preds):
        return jnp.sum(loss(preds, target, mask, tag_ind))
    return gnorm(jax.grad(lf)((pred0, pred1)))
print(f"loss only fwd+bwd (full)       "
      f"{timeit(loss_fwdbwd, (pred0, pred1, target, mask, tag_ind)):8.2f} ms")

mse_c = JointsMSELossWithMask()
@jax.jit
def mse_fwdbwd(pred0, pred1, target, mask):
    def lf(preds):
        p0, p1 = preds
        return (jnp.sum(mse_c(p0[..., :K], target[:, 0, :128, :128, :],
                              mask[:, 0, :128, :128]))
                + jnp.sum(mse_c(p1, target[:, 1], mask[:, 1])))
    return gnorm(jax.grad(lf)((pred0, pred1)))
print(f"  mse part only                "
      f"{timeit(mse_fwdbwd, (pred0, pred1, target, mask)):8.2f} ms")

ae_c = AELoss()
@jax.jit
def ae_fwdbwd(pred0, tag_ind):
    def lf(p0):
        push, pull = ae_c(p0[..., K:], tag_ind[:, 0]) * 0.001
        return push + pull
    return gnorm(jax.grad(lf)(pred0))
print(f"  ae part only                 {timeit(ae_fwdbwd, (pred0, tag_ind)):8.2f} ms")

# 7b. mse with exact-size per-level targets (no padded [S,256,256] layout)
t0_exact = jnp.asarray(np.ascontiguousarray(np.asarray(target)[:, 0, :128, :128, :]))
t1_exact = jnp.asarray(np.ascontiguousarray(np.asarray(target)[:, 1]))
m0_exact = jnp.ones((B, 128, 128), jnp.float32)
m1_exact = jnp.ones((B, 256, 256), jnp.float32)
@jax.jit
def mse_exact_fwdbwd(pred0, pred1, t0_exact, t1_exact, m0_exact, m1_exact):
    def lf(preds):
        p0, p1 = preds
        return (jnp.sum(mse_c(p0[..., :K], t0_exact, m0_exact))
                + jnp.sum(mse_c(p1, t1_exact, m1_exact)))
    return gnorm(jax.grad(lf)((pred0, pred1)))
print(f"  mse, exact-size targets      "
      f"{timeit(mse_exact_fwdbwd, (pred0, pred1, t0_exact, t1_exact, m0_exact, m1_exact)):8.2f} ms")

# 8. optimizer only
opt_state = tx.init(params)
@jax.jit
def opt_only(params, opt_state):
    import optax
    grads = jax.tree.map(jnp.ones_like, params)
    updates, new_opt = tx.update(grads, opt_state, params)
    return gnorm(optax.apply_updates(params, updates))
print(f"optimizer only (adam)          {timeit(opt_only, (params, opt_state)):8.2f} ms")

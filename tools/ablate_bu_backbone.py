"""Shape sensitivity of HRNet-W32 backbone fwd+bwd at EQUAL pixel counts.

The bottom-up step (batch 24 @ 512x512) spends 229 ms in the backbone where
the top-down step (batch 128 @ 256x192) spends ~75 ms — same total pixels,
same weights, same dtype. This tool pins down whether that is batch/spatial
tiling, a stage-specific blowup, or train-BN reductions, by timing the full
backbone across equal-pixel shapes and the 512-case stage by stage.
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

from mindpose_tpu.models.backbones.hrnet import HRNet, _freeze_cfg, _w_cfg

dt = jnp.bfloat16
ITERS = int(os.environ.get("ITERS", 10))


def timeit_fn(step, args, iters=ITERS):
    g = step(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1000


def bb_cost(net, variables, x, train=True):
    def fwd(params, x):
        out = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=train, mutable=["batch_stats"] if train else [],
        )
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out.astype(jnp.float32))

    step = jax.jit(jax.grad(fwd, argnums=0))
    ms = timeit_fn(step, (variables["params"], x))
    try:
        c = step.lower(variables["params"], x).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        fl, by = c.get("flops", 0) / 1e12, c.get("bytes accessed", 0) / 1e9
    except Exception:
        fl = by = float("nan")
    return ms, fl, by


net = HRNet(stage_cfg=_freeze_cfg(_w_cfg(32)), dtype=dt)
rng = np.random.RandomState(0)

print(f"{'shape':26s} {'ms':>8s} {'TFLOP':>7s} {'GB':>7s} {'ms/Mpix':>8s}")
for (b, h, w) in [(128, 256, 192), (96, 256, 256), (48, 512, 256),
                  (24, 512, 512)]:
    x = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x[:1], train=False)
    mpix = b * h * w / 1e6
    for train in (True, False):
        ms, fl, by = bb_cost(net, variables, x, train=train)
        tag = "train" if train else "eval "
        print(f"B{b:<4d}{h}x{w:<8} {tag}BN {ms:8.2f} {fl:7.2f} {by:7.1f}"
              f" {ms/mpix:8.3f}", flush=True)

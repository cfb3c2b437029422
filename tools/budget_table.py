"""Speed-of-light budget: per-stage FLOPs / bytes / ridge class / bound.

Assembles the scattered "the exact step is at XLA's ceiling" evidence
(docs/performance.md rounds 1-4) into one closed per-stage table
(VERDICT r4 item 8): for each part of the HRNet-W32 256x192 train step
(stem, stage1-4, head, loss, optimizer, full step) it compiles the
fwd+bwd program, reads XLA's cost analysis (FLOPs, bytes accessed),
measures amortized wall time, and classifies each part against the v5e
ridge point:

    AI = FLOPs / bytes;  ridge = peak_flops / peak_bw  (~240 FLOP/byte)
    bound_ms = max(FLOPs / peak_flops, bytes / peak_bw)

`achieved/bound` close to 1 means the part runs at the hardware roofline
for ITS OWN FLOP/byte mix — schedule is closed; any remaining gap to peak
MXU is arithmetic intensity (architecture), not scheduling.

Run on the real chip (serialized with other TPU jobs):
    python tools/budget_table.py [--batch 128] [--iters 20]
"""
import argparse
import json
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

# TPU v5e (1 chip): bf16 peak and HBM bandwidth (public spec: 197 TFLOP/s
# bf16, 819 GB/s). The ridge point separates compute- from bandwidth-bound.
PEAK_FLOPS = 197e12
PEAK_BW = 819e9
RIDGE = PEAK_FLOPS / PEAK_BW


def _cost(compiled):
    """(flops, bytes) from XLA cost analysis; (None, None) if unavailable."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def measure(name, fn, args, iters, rows):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    flops, bytes_ = _cost(compiled)
    o = compiled(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        o = compiled(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]
    ms = (time.perf_counter() - t0) / iters * 1000
    row = {"part": name, "ms": round(ms, 2), "flops": flops, "bytes": bytes_}
    if flops and bytes_:
        ai = flops / bytes_
        bound_ms = max(flops / PEAK_FLOPS, bytes_ / PEAK_BW) * 1e3
        row.update({
            "ai_flop_per_byte": round(ai, 1),
            "bound": "compute" if ai >= RIDGE else "bandwidth",
            "bound_ms": round(bound_ms, 2),
            "achieved_tflops": round(flops / ms / 1e9, 1),
            "achieved_gbps": round(bytes_ / ms / 1e6, 1),
            "pct_of_bound": round(100 * bound_ms / ms, 1),
        })
    rows.append(row)
    print(f"{name:26s} {ms:8.2f} ms  "
          + (f"{row['flops'] / 1e9:8.1f} GFLOP {row['bytes'] / 1e9:7.2f} GB  "
               f"AI={row['ai_flop_per_byte']:6.1f} {row['bound']:9s} "
               f"bound={row['bound_ms']:7.2f} ms  {row['pct_of_bound']:5.1f}%"
             if flops and bytes_ else "(no cost analysis)"),
          flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="docs/experiments/budget_r5.json")
    args = ap.parse_args()
    B = args.batch

    import flax.linen as nn

    import mindpose_tpu as mp
    from mindpose_tpu.models.backbones.hrnet import HRModule
    from mindpose_tpu.models.backbones.resnet import Bottleneck
    from mindpose_tpu.models.common import batch_norm, conv3x3
    from mindpose_tpu.optim import create_optimizer
    from mindpose_tpu.parallel import build_train_step, create_train_state

    dt = jnp.bfloat16
    W = 32
    SH, SW = 64, 48
    rng = np.random.RandomState(0)
    rows = []

    # ---- per-part fwd+bwd programs (profile_parts.py decomposition) ----
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = x.astype(dt)
            for _ in range(2):
                x = conv3x3(64, 2, dt)(x)
                x = batch_norm(train, dt)(x)
                x = nn.relu(x)
            return x

    class Stage1(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = Bottleneck(64, downsample=True, dtype=dt)(x, train)
            for _ in range(3):
                x = Bottleneck(64, dtype=dt)(x, train)
            return x

    class StageN(nn.Module):
        n_modules: int
        n_branches: int
        channels: tuple

        @nn.compact
        def __call__(self, x, train=True):
            xs = []
            for i, c in enumerate(self.channels):
                t = conv3x3(c, 1 if i == 0 else 2, dt)(x if i == 0 else xs[-1])
                xs.append(nn.relu(batch_norm(train, dt)(t)))
            for _ in range(self.n_modules):
                xs = HRModule(
                    num_branches=self.n_branches, block="BASIC",
                    num_blocks=(4,) * self.n_branches,
                    in_channels=self.channels, num_channels=self.channels,
                    multi_scale_output=True, dtype=dt)(xs, train)
            return xs[0]

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.Conv(17, (1, 1), dtype=dt)(x.astype(dt))

    def part(name, module, shape):
        x = jnp.asarray(rng.rand(B, *shape).astype(np.float32))
        variables = module.init(jax.random.PRNGKey(0), x, train=False)
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        def fwd(params, x):
            out = module.apply({"params": params, "batch_stats": stats}, x,
                               train=True, mutable=["batch_stats"])[0]
            return jnp.sum(out.astype(jnp.float32))

        measure(name, jax.grad(fwd, argnums=(0, 1)), (params, x),
                args.iters, rows)

    part("stem (256x192 -> /4)", Stem(), (256, 192, 3))
    part("stage1 (4xbottleneck)", Stage1(), (SH, SW, 64))
    part("stage2 (1 mod, 2 br)",
         StageN(n_modules=1, n_branches=2, channels=(W, 2 * W)), (SH, SW, W))
    part("stage3 (4 mod, 3 br)",
         StageN(n_modules=4, n_branches=3, channels=(W, 2 * W, 4 * W)),
         (SH, SW, W))
    part("stage4 (3 mod, 4 br)",
         StageN(n_modules=3, n_branches=4,
                channels=(W, 2 * W, 4 * W, 8 * W)), (SH, SW, W))
    part("head (1x1 conv 32->17)", Head(), (SH, SW, W))

    # ---- loss (f32, the real NetWithLoss epilogue) ----
    hm = jnp.asarray(rng.rand(B, SH, SW, 17).astype(np.float32))
    y = jnp.asarray(rng.rand(B, SH, SW, 17).astype(np.float32))
    tw = jnp.ones((B, 17), jnp.float32)
    loss_fn = mp.create_loss("joint_mse", use_target_weight=True)
    measure("loss (joint_mse)",
            jax.grad(lambda hm: jnp.sum(loss_fn(hm, y, tw))), (hm,),
            args.iters, rows)

    # ---- optimizer (adamw over the real 28.6M param tree) ----
    net = mp.create_network("hrnet_w32", "hrnet_head", dtype=dt)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 256, 192, 3), jnp.float32), train=False)
    tx = create_optimizer(variables["params"], "adamw", learning_rate=1e-3,
                          weight_decay=0.05)
    opt_state = tx.init(variables["params"])
    grads = jax.tree_util.tree_map(jnp.ones_like, variables["params"])

    def opt(params, opt_state, grads):
        import optax
        updates, new_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state

    measure("optimizer (adamw)", opt,
            (variables["params"], opt_state, grads), args.iters, rows)

    # ---- full real train step ----
    lossm = mp.create_loss("joint_mse", use_target_weight=True)
    nwl = mp.create_network_with_loss(net, lossm, has_extra_inputs=True)
    state = create_train_state(variables, tx)
    step = build_train_step(nwl, tx, mesh=None, donate=False)
    x = jnp.asarray(rng.rand(B, 256, 192, 3).astype(np.float32))
    measure("FULL STEP (fwd+bwd+opt)", lambda s: step(s, x, y, tw),
            (state,), args.iters, rows)

    with open(args.out, "w") as f:
        json.dump({"batch": B, "peak_flops": PEAK_FLOPS, "peak_bw": PEAK_BW,
                   "ridge_flop_per_byte": RIDGE, "rows": rows}, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

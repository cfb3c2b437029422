"""Per-component timing of the HRNet-W32 train step on TPU.

Times each architectural piece (stem / stage1 / stage2 / stage3 / stage4 /
head+loss) as an independent jitted forward+backward program at the bench
batch size, plus the full step, so optimization effort lands where the time
is. Amortized timing: chain N dispatches, fetch one value (the only reliable
barrier over the axon tunnel — see docs/performance.md).

Usage: python tools/profile_parts.py [--batch 128] [--iters 20]
"""
import argparse
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


def time_fwd_bwd(module, x_shape, iters, extra_kwargs=None, reduce_out=None):
    """Compile fwd+bwd(params, x) for `module` and return amortized ms."""
    extra_kwargs = extra_kwargs or {}
    x = jnp.asarray(np.random.RandomState(0).rand(*x_shape).astype(np.float32))

    variables = module.init(jax.random.PRNGKey(0), x, train=False, **extra_kwargs)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fwd(params, x):
        out = module.apply(
            {"params": params, "batch_stats": stats},
            x,
            train=True,
            mutable=["batch_stats"],
            **extra_kwargs,
        )[0]
        if reduce_out is not None:
            out = reduce_out(out)
        return jnp.sum(out.astype(jnp.float32))

    step = jax.jit(jax.grad(fwd, argnums=(0, 1)))
    g = step(params, x)
    _ = np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0]

    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(params, x)
    _ = np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1000


class _Seq:
    """List of (module, shape) timed as one; placeholder for composition."""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--input", default="256x192",
                    help="input HxW (e.g. 512x512 for the bottom-up shape)")
    args = ap.parse_args()
    B, W = args.batch, args.width
    IH, IW = (int(v) for v in args.input.split("x"))
    SH, SW = IH // 4, IW // 4  # post-stem branch-0 resolution

    import flax.linen as nn

    from mindpose_tpu.models.backbones.hrnet import HRModule, _w_cfg, _freeze_cfg, HRNet
    from mindpose_tpu.models.backbones.resnet import Bottleneck
    from mindpose_tpu.models.common import batch_norm, conv3x3

    dt = jnp.bfloat16

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = x.astype(dt)
            x = conv3x3(64, 2, dt)(x)
            x = batch_norm(train, dt)(x)
            x = nn.relu(x)
            x = conv3x3(64, 2, dt)(x)
            x = batch_norm(train, dt)(x)
            return nn.relu(x)

    class Stage1(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = Bottleneck(64, downsample=True, dtype=dt)(x, train)
            for _ in range(3):
                x = Bottleneck(64, dtype=dt)(x, train)
            return x

    class StageN(nn.Module):
        name_: str
        n_modules: int
        n_branches: int
        channels: tuple

        @nn.compact
        def __call__(self, x, train=True):
            # x: highest-res input; build lower branches with strided convs
            # (approximates transition cost) then run the modules
            xs = []
            t = x
            for i, c in enumerate(self.channels):
                ti = conv3x3(c, 1 if i == 0 else 2, dt)(t if i == 0 else xs[-1])
                ti = nn.relu(batch_norm(train, dt)(ti))
                xs.append(ti)
            for _ in range(self.n_modules):
                xs = HRModule(
                    num_branches=self.n_branches,
                    block="BASIC",
                    num_blocks=(4,) * self.n_branches,
                    in_channels=self.channels,
                    num_channels=self.channels,
                    multi_scale_output=True,
                    dtype=dt,
                )(xs, train)
            return xs[0]

    class HeadLoss(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = nn.Conv(17, (1, 1), dtype=dt)(x.astype(dt))
            return x

    rows = []

    def add(name, module, shape, **kw):
        ms = time_fwd_bwd(module, (B,) + shape, args.iters, **kw)
        rows.append((name, ms))
        print(f"{name:28s} {ms:8.2f} ms")

    add(f"stem ({IH}x{IW}x3 -> /4)", Stem(), (IH, IW, 3))
    add(f"stage1 (4 bottleneck@{SH}x{SW})", Stage1(), (SH, SW, 64))
    add("stage2 (1 mod, 2 br)", StageN(name_="s2", n_modules=1, n_branches=2,
                                       channels=(W, W * 2)), (SH, SW, W))
    add("stage3 (4 mod, 3 br)", StageN(name_="s3", n_modules=4, n_branches=3,
                                       channels=(W, W * 2, W * 4)), (SH, SW, W))
    add("stage4 (3 mod, 4 br)", StageN(name_="s4", n_modules=3, n_branches=4,
                                       channels=(W, W * 2, W * 4, W * 8)), (SH, SW, W))
    add("head (1x1 conv 32->17)", HeadLoss(), (SH, SW, W))

    total = sum(ms for _, ms in rows)
    print(f"{'SUM of parts':28s} {total:8.2f} ms")

    # full backbone fwd+bwd for comparison
    net = HRNet(stage_cfg=_freeze_cfg(_w_cfg(W)), dtype=dt)
    ms = time_fwd_bwd(net, (B, IH, IW, 3), args.iters)
    print(f"{'full backbone fwd+bwd':28s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()

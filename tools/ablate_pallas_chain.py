"""Go/no-go: Pallas VMEM-fused 3x3 conv-chain vs XLA, C=32 geometries.

The speed-of-light budget (docs/performance.md) classifies HRNet's C=32
3x3 stacks as MXU-lane-limited (N=32/128 columns -> 25%-of-peak ceiling
~49 TFLOP/s) with XLA achieving 15-28. This probe measures whether VMEM
residency (one HBM read + one write for the whole 8-conv chain, im2col
K=288 MXU feeds) closes any of that gap — the one schedule lever the
round-4 campaign did not test (VERDICT r4 item 8). Forward-only: the
question is the schedule ceiling, and fwd shares the same lane geometry
as bwd.

Run on the real chip:  python tools/ablate_pallas_chain.py
"""
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

from mindpose_tpu.ops.pallas.conv_chain import fused_conv_chain, xla_conv_chain
from mindpose_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

DEPTH = 8
rng = np.random.RandomState(0)


def timeit(f, args, iters=10):
    o = f(*args)
    _ = float(np.asarray(o))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _ = float(np.asarray(o))
    return (time.perf_counter() - t0) / iters * 1000


def run(tag, b, h, w_, c, strips=(8, 16, 32)):
    x = jnp.asarray(rng.rand(b, h, w_, c).astype(np.float32) * 2 - 1
                    ).astype(jnp.bfloat16)
    ws = jnp.asarray(rng.rand(DEPTH, 3, 3, c, c).astype(np.float32) * 0.1
                     ).astype(jnp.bfloat16)
    gflop = 2 * b * h * w_ * 9 * c * c * DEPTH / 1e9

    xla = jax.jit(lambda x, ws: jnp.sum(
        xla_conv_chain(x, ws).astype(jnp.float32)))
    ms_x = timeit(xla, (x, ws))
    rows = [("xla", None, ms_x)]
    print(f"{tag:28s} xla chain          {ms_x:8.2f} ms "
          f"{gflop / ms_x:6.1f} TFLOP/s", flush=True)

    # numeric parity at the first strip (bf16 accumulation-order tolerance)
    ref = np.asarray(xla_conv_chain(x, ws).astype(jnp.float32))
    for s in strips:
        if h % s:
            continue
        pal = jax.jit(lambda x, ws, s=s: jnp.sum(
            fused_conv_chain(x, ws, strip=s).astype(jnp.float32)))
        try:
            got = np.asarray(fused_conv_chain(x, ws, strip=s
                                              ).astype(jnp.float32))
            max_diff = float(np.max(np.abs(got - ref)))
            scale = float(np.max(np.abs(ref))) or 1.0
            ms_p = timeit(pal, (x, ws))
        except Exception as e:  # mosaic compile failures are findings too
            print(f"{tag:28s} pallas strip={s:<3d}    FAILED: "
                  f"{repr(e)[:120]}", flush=True)
            rows.append(("pallas", s, None))
            continue
        rows.append(("pallas", s, ms_p))
        print(f"{tag:28s} pallas strip={s:<3d}   {ms_p:8.2f} ms "
              f"{gflop / ms_p:6.1f} TFLOP/s  reldiff={max_diff / scale:.2e}",
              flush=True)
    return {"tag": tag, "b": b, "h": h, "w": w_, "c": c, "gflop": gflop,
            "rows": [{"impl": i, "strip": s, "ms": m} for i, s, m in rows]}


def main():
    out = []
    # the three C=32 geometries the budget table names
    out.append(run("B24 128x128 (bottomup s1)", 24, 128, 128, 32))
    out.append(run("B24 256x256 (bu head chain)", 24, 256, 256, 32))
    out.append(run("B128 64x48 (topdown branch0)", 128, 64, 48, 32,
                   strips=(8, 16, 32)))
    path = "docs/experiments/pallas_chain_r5.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()

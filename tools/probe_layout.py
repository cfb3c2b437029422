"""Empirical probe: narrow-minor-dim cost on TPU.

Methodology for a high-RTT/low-bandwidth tunnel: run the op N times inside a
single jitted lax.scan and fetch ONE SCALAR (never a full array - host
transfers run ~25 MB/s here and would dominate).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from mindpose_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

N = 100

def scan_time(body, x, n=N, reps=3):
    def scanned(x):
        y = lax.scan(lambda c, _: (body(c), None), x, None, length=n)[0]
        return jnp.sum(y.astype(jnp.float32))
    f = jax.jit(scanned)
    s = f(x); _ = float(s)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = f(x)
        _ = float(s)
        times.append(time.perf_counter() - t0)
    return min(times) / n * 1000

print("== elementwise (tanh*1.5+x) x100 in one scan, scalar fetch ==")
for shape in [(128,64,48,32), (128,64,12,128), (128,64,48,64), (128,64,24,128), (128,64,48,256), (128,64,96,128)]:
    x = jnp.zeros(shape, jnp.bfloat16)
    ms = scan_time(lambda x: jnp.tanh(x) * 1.5 + x, x)
    mb = np.prod(shape) * 2 / 1e6
    print(f"{str(shape):22s} {ms:8.4f} ms   {mb:6.1f} MB   {2*mb/ms:8.1f} GB/s")

print("== conv3x3 same-FLOPs ladder x100 ==")
import flax.linen as nn
for (h,w,c) in [(64,48,32),(32,24,64),(16,12,128),(8,6,256)]:
    x = jnp.zeros((128,h,w,c), jnp.bfloat16)
    conv = nn.Conv(c, (3,3), padding=((1,1),(1,1)), use_bias=False, dtype=jnp.bfloat16)
    v = conv.init(jax.random.PRNGKey(0), x)
    ms = scan_time(lambda x: conv.apply(v, x), x)
    flops = 128*h*w*9*c*c*2/1e9
    print(f"conv3x3 {h}x{w}x{c:<4d} {ms:8.4f} ms  {flops:6.1f} GFLOP  {flops/ms:8.1f} TFLOP/s")

print("== conv1x1 stage1 shapes x100 ==")
for (cin,cout) in [(256,64),(64,256),(256,256),(32,32)]:
    x = jnp.zeros((128,64,48,cin), jnp.bfloat16)
    conv = nn.Conv(cout, (1,1), use_bias=False, dtype=jnp.bfloat16)
    v = conv.init(jax.random.PRNGKey(0), x)
    def body(x, conv=conv, v=v, cin=cin, cout=cout):
        y = conv.apply(v, x)
        if cout < cin:
            y = jnp.concatenate([y, jnp.zeros(y.shape[:-1]+(cin-cout,), y.dtype)], -1)
        elif cout > cin:
            y = y[..., :cin]
        return y
    ms = scan_time(body, x)
    flops = 128*64*48*cin*cout*2/1e9
    print(f"conv1x1 {cin}->{cout:<4d} {ms:8.4f} ms  {flops:6.1f} GFLOP  {flops/ms:8.1f} TFLOP/s")

print("== BN train-mode x100 ==")
for c in [32, 64, 128, 256]:
    x = jnp.zeros((128,64,48,c), jnp.bfloat16)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5, dtype=jnp.bfloat16)
    v = bn.init(jax.random.PRNGKey(0), x)
    ms = scan_time(lambda x, bn=bn, v=v: bn.apply(v, x, mutable=["batch_stats"])[0], x)
    mb = np.prod(x.shape)*2/1e6
    print(f"BN 64x48x{c:<4d} {ms:8.4f} ms  {mb:6.1f} MB  {2*mb/ms:8.1f} GB/s")

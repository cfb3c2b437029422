"""Parity of the Pallas fused conv-chain vs the XLA per-conv chain.

The kernel is a measurement probe (docs/performance.md speed-of-light
budget; tools/ablate_pallas_chain.py), but its math must still be exact:
interpret-mode on CPU against lax.conv, f32 so the only tolerance is
accumulation order.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mindpose_tpu.ops.pallas.conv_chain import fused_conv_chain, xla_conv_chain


def _case(b, h, w, c, depth, strip):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)
    ws = jnp.asarray(rng.randn(depth, 3, 3, c, c).astype(np.float32) * 0.2)
    ref = xla_conv_chain(x, ws)
    out = fused_conv_chain(x, ws, strip=strip, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_parity_small():
    _case(b=2, h=8, w=8, c=8, depth=3, strip=4)


def test_parity_rect_multistrip():
    # rectangular image, strip smaller than H, even/odd depth ping-pong
    _case(b=1, h=16, w=12, c=4, depth=4, strip=4)


def test_strip_must_divide():
    x = jnp.zeros((1, 10, 8, 4))
    ws = jnp.zeros((2, 3, 3, 4, 4))
    try:
        fused_conv_chain(x, ws, strip=4, interpret=True)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError for H % strip != 0")

"""Post-training int8 weight quantization for serving.

Beyond the reference (it ships no deployment path at all): serving at small
batch is weight-bandwidth-bound — every request re-reads the full parameter
set from HBM while the MXU idles. Storing conv/dense kernels as int8 with
per-output-channel float scales halves-to-quarters the weight bytes; the
dequantize happens INSIDE the jitted forward, so XLA keeps int8 in HBM,
converts on-chip, and fuses the multiply into the consumer — there is no
host-side dequantized copy. This is weight-only quantization (activations
stay bf16/f32): no calibration data needed, and accuracy loss is bounded by
the per-channel rounding error checked in tests/models/test_quantize.py.

Usage:
    qvars = quantize_variables(variables)          # int8 kernels + scales
    out = net.apply(dequantize_variables(qvars), x)   # inside jit

or wrap an EvalNet via ``quantized_eval_apply`` (what TopDownPredictor's
``quantize="int8"`` does).
"""
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_variables",
    "dequantize_variables",
    "quantized_eval_apply",
    "quantized_bytes",
]

# quantize only weight matrices/filters; biases, BN params/stats and scales
# stay float (tiny, and int8 would visibly hurt)
_KERNEL_NAMES = ("kernel", "embedding")
_MIN_SIZE = 1024  # leave tiny leaves float; no bandwidth to win


def _iter_quantizable(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_quantizable(v, path + (k,))
    else:
        yield path, tree


def _is_kernel(path: Tuple[str, ...], leaf) -> bool:
    return (
        path and path[-1] in _KERNEL_NAMES
        and hasattr(leaf, "size") and leaf.size >= _MIN_SIZE
        and jnp.issubdtype(np.asarray(leaf).dtype, np.floating)
    )


def quantize_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Symmetric per-output-channel int8 quantization of kernel leaves.

    The output-channel axis is the last kernel axis for both flax Conv
    (H, W, Cin, Cout) and Dense (Cin, Cout). Returns a new variables dict
    where each quantized leaf is replaced by
    ``{"q": int8 array, "scale": float32 per-channel scale}``; everything
    else is kept as-is. ``dequantize_variables`` inverts it.
    """

    def visit(tree, path=()):
        if isinstance(tree, dict):
            return {k: visit(v, path + (k,)) for k, v in tree.items()}
        leaf = tree
        if not _is_kernel(path, leaf):
            return leaf
        w = np.asarray(leaf, np.float32)
        absmax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)),
                        keepdims=True)
        scale = np.maximum(absmax, 1e-12) / 127.0
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return {"q": jnp.asarray(q),
                "scale": jnp.asarray(scale.astype(np.float32))}

    return visit(variables)


def _is_qleaf(node) -> bool:
    return (
        isinstance(node, dict) and set(node.keys()) == {"q", "scale"}
        and getattr(node["q"], "dtype", None) == jnp.int8
    )


def dequantize_variables(qvariables: Dict[str, Any],
                         dtype=jnp.float32) -> Dict[str, Any]:
    """Rebuild a float variables dict. Call INSIDE jit so the int8->float
    convert runs on device and fuses into the consumers."""

    def visit(node):
        if _is_qleaf(node):
            return (node["q"].astype(jnp.float32) * node["scale"]).astype(
                dtype)
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        return node

    return visit(qvariables)


def quantized_eval_apply(eval_net, qvariables):
    """jit-compiled ``(image, *decoder_inputs) -> decoder outputs`` closure
    over int8 weights. The dequantize traces inside the jit boundary, so the
    executable's weight operands are the int8 arrays themselves."""

    @jax.jit
    def apply(*inputs):
        return eval_net.apply(dequantize_variables(qvariables), *inputs)

    return apply


def quantized_bytes(qvariables) -> Tuple[int, int]:
    """(quantized_bytes, float_equivalent_bytes) over kernel leaves —
    the HBM weight-traffic saving this buys."""
    qb = fb = 0
    def visit(node):
        nonlocal qb, fb
        if _is_qleaf(node):
            qb += node["q"].size + node["scale"].size * 4
            fb += node["q"].size * 4
        elif isinstance(node, dict):
            for v in node.values():
                visit(v)
    visit(qvariables)
    return qb, fb

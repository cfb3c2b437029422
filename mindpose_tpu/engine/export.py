"""Serving export: EvalNet -> serialized StableHLO artifact (jax.export).

The reference's deployment story stops at MindSpore checkpoint files (its
`tools/eval.py` re-assembles the network from the YAML config every time).
On TPU the natural serving artifact is an ahead-of-time-lowered StableHLO
program: weights baked in as constants, batch dimension symbolic, callable
in any process with ``jax.export.deserialize`` — no framework code, config
or checkpoint needed at serving time, and loadable from non-Python runtimes
that speak StableHLO.

Exported programs carry the full fused graph (backbone forward + on-device
heatmap decode), so a server does one call per batch and receives final
keypoint predictions.
"""
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as _jexport

__all__ = ["export_serving_fn", "export_eval_net", "load_serving_fn"]


def export_serving_fn(
    fn,
    specs: Sequence[jax.ShapeDtypeStruct],
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Lower ``fn(*specs)`` and serialize it (weights already closed over).

    Args:
        fn: pure function of positional array arguments.
        specs: one ShapeDtypeStruct per argument; dimensions may be symbolic
            (see :func:`export_eval_net` for the batch-polymorphic recipe).
        platforms: lowering platforms, default ``("tpu", "cpu")`` so one
            artifact serves on TPU and can be smoke-tested host-side.
    """
    platforms = tuple(platforms or ("tpu", "cpu"))
    exported = _jexport.export(jax.jit(fn), platforms=platforms)(*specs)
    return bytes(exported.serialize())


def export_eval_net(
    eval_net: Any,
    variables: Any,
    image_hw: Tuple[int, int],
    batch: Any = "b",
    extra_specs: Optional[Sequence[jax.ShapeDtypeStruct]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Export an EvalNet (forward + decode) with weights baked in.

    Args:
        eval_net: models.networks.EvalNet (or anything with
            ``apply(variables, image, *extras)``).
        variables: the trained variables pytree (baked into the artifact
            as constants).
        image_hw: static input (H, W).
        batch: symbolic dim name (default ``"b"`` = any batch size) or an
            int to pin a static batch.
        extra_specs: specs for the decoder inputs AFTER the image, with the
            batch dim expressed as the same ``batch`` value. Default: the
            top-down decoder's (center [b,2], scale [b,2], score [b]).
    """
    if isinstance(batch, str):
        (b,) = _jexport.symbolic_shape(batch)
    else:
        b = int(batch)
    h, w = int(image_hw[0]), int(image_hw[1])
    image = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    if extra_specs is None:
        extra_specs = [
            jax.ShapeDtypeStruct((b, 2), jnp.float32),  # center
            jax.ShapeDtypeStruct((b, 2), jnp.float32),  # scale
            jax.ShapeDtypeStruct((b,), jnp.float32),  # bbox score
        ]
    else:
        extra_specs = [
            jax.ShapeDtypeStruct((b,) + tuple(s.shape[1:]), s.dtype)
            for s in extra_specs
        ]

    def serve(image, *extras):
        return eval_net.apply(variables, image, *extras)

    return export_serving_fn(serve, [image, *extra_specs],
                             platforms=platforms)


def load_serving_fn(data: bytes):
    """Deserialize an exported artifact; returns a callable ``f(*arrays)``."""
    exported = _jexport.deserialize(bytearray(data))
    return exported.call

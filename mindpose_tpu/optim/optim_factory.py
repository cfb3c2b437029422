"""Optimizer factory on optax.

Parity: /root/reference/mindpose/optim/optim_factory.py — registered names
adam/sgd/momentum/adagrad/adamw, with the bias/BN-no-weight-decay grouping
(the reference filters params whose name contains beta/gamma/bias; in flax
that's BatchNorm ``scale``/``bias`` and conv/dense ``bias`` leaves).

``loss_scale`` is accepted for config parity but unused: bf16 training on TPU
needs no loss scaling.
"""
from typing import Any, Callable, Union

import jax
import jax.numpy as jnp
import optax

from ..register import entrypoint, register

__all__ = [
    "create_optimizer",
    "decay_mask",
    "radial_projection_mask",
    "project_radial",
    "layer_decay_scales",
]


def decay_mask(params) -> Any:
    """True for leaves that should receive weight decay (conv/dense kernels)."""

    def is_decay(path, _):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return name not in ("bias", "scale")

    return jax.tree_util.tree_map_with_path(is_decay, params)


def radial_projection_mask(params) -> Any:
    """True for conv kernels whose output channels are BatchNorm-normalized.

    In this model zoo that is every 4-D conv kernel in the backbone, plus the
    heads' BN-followed deconvs; the final heatmap convs (no BN after) must
    keep their radial degree of freedom.
    """

    def probe(path, leaf):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        if getattr(leaf, "ndim", 0) != 4:
            return False
        # ViT's patch_embed feeds LayerNorm (not per-output-channel
        # scale-invariant) — never project it
        if any("patch_embed" in n for n in names):
            return False
        if names and names[0] == "backbone":
            return True
        # head-side BN-followed convs: SimpleBaseline/HigherHRNet deconvs
        # and HigherHRNet's refine BasicBlocks
        return any("ConvTranspose" in n or "BasicBlock" in n for n in names)

    return jax.tree_util.tree_map_with_path(probe, params)


def project_radial(mask) -> "optax.GradientTransformation":
    """Remove each masked conv filter's radial *update* component.

    A conv channel feeding (train-mode) BatchNorm is scale-invariant: exact
    BN backward keeps the gradient orthogonal to the filter, which pins the
    weight norm and with it the effective learning rate. Frozen-variance
    BN (``bn_grad_stats: "frozen_var"``, models/common.py) drops exactly
    that orthogonality term, letting filter norms drift and training slowly
    diverge — measured on the synthetic benchmark (docs/performance.md).

    Appended AFTER the optimizer (AdamP-style: arXiv:2006.08217 shows the
    projection must act on the final update, since Adam's per-coordinate
    rescaling reintroduces radial components even from tangential
    gradients), this projects each masked filter's update onto its
    per-output-channel tangent space (u <- u - <u,w>/<w,w> w), pinning the
    norm to first order for ~1e-3 of the step's FLOPs.
    """

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("project_radial requires params")

        def proj(g, w, m):
            if not m:
                return g
            axes = tuple(range(g.ndim - 1))
            dot = jnp.sum(g * w, axis=axes, keepdims=True)
            nrm = jnp.sum(w * w, axis=axes, keepdims=True)
            return g - w * (dot / (nrm + 1e-12))

        return jax.tree_util.tree_map(proj, updates, params, mask), state

    return optax.GradientTransformation(init, update)


def layer_decay_scales(params, decay: float) -> Any:
    """Per-leaf layer-wise lr multipliers for depth-indexed (ViT) backbones.

    The ViTPose fine-tuning recipe (arXiv:2204.12484, following BEiT):
    head and final norm train at full lr, transformer block ``i`` at
    ``decay^(depth - i)``, patch/position embeddings at ``decay^(depth+1)``
    — earlier (more general) layers move less. Block depth is inferred from
    the ``block_{i}`` scope names; raises for CNN trees, where the knob has
    no defined meaning.
    """
    import re

    def block_index(path):
        for p in path:
            name = p.key if hasattr(p, "key") else str(p)
            m = re.fullmatch(r"block_(\d+)", name)
            if m:
                return int(m.group(1))
        return None

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    blocks = [i for i in (block_index(path) for path, _ in leaves)
              if i is not None]
    if not blocks:
        raise ValueError(
            "layer_decay requires a block-indexed (ViT) backbone; this "
            "parameter tree has no block_{i} scopes"
        )
    depth = max(blocks) + 1

    def scale(path, _):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        i = block_index(path)
        if i is not None:
            layer_id = i + 1
        elif names and names[0] == "backbone" and any(
            n in ("patch_embed", "pos_embedding") for n in names
        ):
            layer_id = 0
        else:  # head / neck / final norm: full lr
            layer_id = depth + 1
        return decay ** (depth + 1 - layer_id)

    return jax.tree_util.tree_map_with_path(scale, params)


def _scale_updates(scales) -> "optax.GradientTransformation":
    """Multiply final updates by a static per-leaf scale pytree (appended
    after the optimizer, so the scale acts as a per-layer learning rate)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def _register_optimizers():
    @register("optim", extra_name="adam")
    def adam(learning_rate, weight_decay=0.0, mask=None, **kw):
        tx = optax.adam(learning_rate, **_filter(kw, ("b1", "b2", "eps")))
        return _with_decay(tx, weight_decay, mask)

    @register("optim", extra_name="sgd")
    def sgd(learning_rate, weight_decay=0.0, mask=None, **kw):
        tx = optax.sgd(learning_rate)
        return _with_decay(tx, weight_decay, mask)

    @register("optim", extra_name="momentum")
    def momentum(learning_rate, weight_decay=0.0, mask=None, momentum=0.9, **kw):
        tx = optax.sgd(learning_rate, momentum=momentum)
        return _with_decay(tx, weight_decay, mask)

    @register("optim", extra_name="adagrad")
    def adagrad(learning_rate, weight_decay=0.0, mask=None, **kw):
        tx = optax.adagrad(learning_rate)
        return _with_decay(tx, weight_decay, mask)

    @register("optim", extra_name="adamw")
    def adamw(learning_rate, weight_decay=0.0, mask=None, **kw):
        return optax.adamw(
            learning_rate,
            weight_decay=weight_decay,
            mask=mask,
            **_filter(kw, ("b1", "b2", "eps")),
        )


def _filter(kw, keys):
    return {k: v for k, v in kw.items() if k in keys}


def _with_decay(tx, weight_decay: float, mask):
    """Additive L2 decay (MindSpore-style) ahead of the optimizer update."""
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay, mask=mask), tx)
    return tx


_register_optimizers()


def create_optimizer(
    params: Any,
    name: str = "adam",
    learning_rate: Union[float, Callable] = 0.001,
    weight_decay: float = 0.0,
    filter_bias_and_bn: bool = True,
    loss_scale: float = 1.0,  # parity knob; no-op with bf16 on TPU
    radial_projection: bool = False,
    layer_decay: float = 0.0,
    **kwargs: Any,
) -> optax.GradientTransformation:
    """Create an optax optimizer over the model's parameter pytree.

    ``radial_projection`` inserts :func:`project_radial` into the update
    chain (an experiment knob from the frozen-statistics BN campaign, see
    docs/performance.md). Weight decay is applied AFTER the projection —
    the decay term is purely radial, so projecting it away would silently
    disable regularization on every masked filter (AdamP, arXiv:2006.08217,
    keeps decay outside the projection for the same reason). Only the
    adamw composition supports this ordering; other optimizers reject the
    knob rather than mis-apply it.
    """
    mask = None
    if weight_decay and filter_bias_and_bn:
        mask = decay_mask(params)
    if radial_projection:
        if name not in ("adamw", "AdamWeightDecay"):
            raise ValueError(
                f"radial_projection is only supported with adamw (got {name!r})"
            )
        proj = project_radial(radial_projection_mask(params))
        tx = optax.chain(
            optax.scale_by_adam(
                **{k: kwargs[k] for k in ("b1", "b2", "eps") if k in kwargs}
            ),
            proj,
            optax.add_decayed_weights(weight_decay, mask=mask),
            optax.scale_by_learning_rate(learning_rate),
        )
    else:
        tx = entrypoint("optim", name)(
            learning_rate=learning_rate, weight_decay=weight_decay, mask=mask,
            **kwargs,
        )
    if layer_decay:
        # ViTPose fine-tuning recipe: per-layer lr via a post-optimizer
        # update scale (weight decay scales with it, matching the
        # param-group-lr convention)
        if not 0.0 < layer_decay <= 1.0:
            raise ValueError(f"layer_decay must be in (0, 1], got {layer_decay}")
        tx = optax.chain(tx, _scale_updates(layer_decay_scales(params, layer_decay)))
    return tx

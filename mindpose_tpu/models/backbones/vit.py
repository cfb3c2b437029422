"""ViT backbone for ViTPose-style top-down estimation (stretch config).

Not present in the reference (SURVEY.md §7 stretch goal; BASELINE.json config
#5): a plain Vision Transformer following "ViTPose: Simple Vision Transformer
Baselines for Human Pose Estimation" (arXiv:2204.12484) — patch embed 16x16,
standard pre-LN encoder blocks, learned position embeddings, no class token;
the token grid reshapes back to an NHWC feature map for the deconv head.

TPU notes: token count at 256x192 is 16x12=192 — attention is a small
fraction of FLOPs vs the MLPs, so plain jnp attention lowers fine to MXU;
bf16 compute, f32 params/LayerNorm.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...register import register
from .backbone import Backbone

__all__ = ["ViT", "vit_b", "vit_h", "vit_l", "vit_s"]

Dtype = Any


class MlpBlock(nn.Module):
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(d, dtype=self.dtype)(x)


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, deterministic=True
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = MlpBlock(self.mlp_dim, dtype=self.dtype)(y)
        return x + y


class ViT(Backbone):
    """Plain ViT; returns an NHWC feature map at stride ``patch_size``."""

    patch_size: int = 16
    hidden_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.hidden_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        p = self.patch_size
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.hidden_dim,
            (p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        n, h, w, c = x.shape
        x = x.reshape(n, h * w, c)

        # Stored as a (1, gh, gw, c) grid so checkpoints self-describe their
        # token layout; a checkpoint trained at another resolution is
        # bilinearly resized onto this grid at load time
        # (utils/checkpoint.py:load_pretrained_backbone, ViTPose §3 /
        # standard ViT fine-tuning practice).
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, h, w, c),
        )
        x = x + pos.reshape(1, h * w, c).astype(self.dtype)

        for i in range(self.depth):
            x = EncoderBlock(
                num_heads=self.num_heads,
                mlp_dim=self.hidden_dim * self.mlp_ratio,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        return x.reshape(n, h, w, c)


@register("backbone")
def vit_b(
    pretrained: bool = False,
    ckpt_url: str = "",
    in_channels: int = 3,
    dtype: Dtype = jnp.float32,
    **kwargs: Any,
) -> ViT:
    """ViT-Base/16 (86M params): ViTPose-B backbone."""
    return ViT(hidden_dim=768, depth=12, num_heads=12, in_channels=in_channels,
               dtype=dtype)


@register("backbone")
def vit_l(
    pretrained: bool = False,
    ckpt_url: str = "",
    in_channels: int = 3,
    dtype: Dtype = jnp.float32,
    **kwargs: Any,
) -> ViT:
    """ViT-Large/16 (304M params): ViTPose-L backbone."""
    return ViT(hidden_dim=1024, depth=24, num_heads=16,
               in_channels=in_channels, dtype=dtype)


@register("backbone")
def vit_h(
    pretrained: bool = False,
    ckpt_url: str = "",
    in_channels: int = 3,
    dtype: Dtype = jnp.float32,
    **kwargs: Any,
) -> ViT:
    """ViT-Huge/16 (~632M params): ViTPose-H backbone.

    At this scale the replicated AdamW state exceeds a single chip's HBM —
    train with ``parallel_mode: fsdp`` (parallel/fsdp.py).
    """
    return ViT(hidden_dim=1280, depth=32, num_heads=16,
               in_channels=in_channels, dtype=dtype)


@register("backbone")
def vit_s(
    pretrained: bool = False,
    ckpt_url: str = "",
    in_channels: int = 3,
    dtype: Dtype = jnp.float32,
    **kwargs: Any,
) -> ViT:
    """ViT-Small/16 (22M params): ViTPose-S backbone."""
    return ViT(hidden_dim=384, depth=12, num_heads=6, in_channels=in_channels,
               dtype=dtype)

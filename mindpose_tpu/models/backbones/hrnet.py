"""HRNet backbones (HRNet-W32/W48) — multi-resolution parallel CNN.

TPU-native Flax/NHWC re-design of the reference HRNet
(/root/reference/mindpose/models/backbones/hrnet.py:149-718): same topology
(stem /4, bottleneck stage1, 2/3/4-branch stages with exchange units;
`multiscale_output: False` returns the highest-resolution branch), but
functional modules, static Python loops (unrolled by tracing), broadcast-based
nearest upsampling in fusion, bf16 compute / f32 params.
"""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...register import register
from ..common import batch_norm, conv1x1, conv3x3, resize_nearest
from .backbone import Backbone
from .resnet import BasicBlock, Bottleneck

__all__ = ["HRNet", "hrnet_w32", "hrnet_w48"]

Dtype = Any

_BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


def _expansion(block_name: str) -> int:
    return 4 if block_name == "BOTTLENECK" else 1


class HRModule(nn.Module):
    """One exchange unit: per-branch residual blocks then cross-scale fusion."""

    num_branches: int
    block: str
    num_blocks: Sequence[int]
    in_channels: Sequence[int]
    num_channels: Sequence[int]
    multi_scale_output: bool = True
    dtype: Dtype = jnp.float32
    bn_stats_frac: float = 1.0
    bn_grad_stats: str = "exact"
    # run branch 0's BasicBlock chain in 2x2 space-to-depth form (exact
    # rewrite, identical param pytree): C=32 in 128 lanes instead of 32 —
    # wins at large spatial extents (bottom-up 512x512), see
    # docs/performance.md round-4 campaign / tools/ablate_s2d_head.py
    branch0_s2d: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = True):
        block_cls = _BLOCKS[self.block]
        exp = _expansion(self.block)
        out_ch = [c * exp for c in self.num_channels]

        # branches
        ys = []
        for i in range(self.num_branches):
            x = xs[i]
            downsample = self.in_channels[i] != out_ch[i]
            s2d = (self.branch0_s2d and i == 0 and self.block == "BASIC"
                   and not downsample
                   and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
            if s2d:
                from .s2d import S2DBasicBlock, depth_to_space, space_to_depth

                x = space_to_depth(x)
                for _ in range(self.num_blocks[i]):
                    x = S2DBasicBlock(
                        self.num_channels[i], dtype=self.dtype,
                        bn_stats_frac=self.bn_stats_frac,
                        bn_grad_stats=self.bn_grad_stats,
                    )(x, train)
                x = depth_to_space(x)
                ys.append(x)
                continue
            x = block_cls(
                self.num_channels[i], downsample=downsample, dtype=self.dtype,
                bn_stats_frac=self.bn_stats_frac,
                bn_grad_stats=self.bn_grad_stats,
            )(x, train)
            for _ in range(1, self.num_blocks[i]):
                x = block_cls(
                    self.num_channels[i], dtype=self.dtype,
                    bn_stats_frac=self.bn_stats_frac,
                    bn_grad_stats=self.bn_grad_stats,
                )(x, train)
            ys.append(x)

        if self.num_branches == 1:
            return ys

        # fusion
        num_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(num_out):
            h, w = ys[i].shape[1], ys[i].shape[2]
            acc = ys[i]
            for j in range(self.num_branches):
                if j == i:
                    continue
                if j > i:
                    # lower-res -> 1x1 conv + BN + nearest upsample
                    t = conv1x1(out_ch[i], 1, self.dtype)(ys[j])
                    t = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(t)
                    t = resize_nearest(t, h, w)
                else:
                    # higher-res -> chain of strided 3x3 convs
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = out_ch[i] if last else out_ch[j]
                        t = conv3x3(ch, 2, self.dtype)(t)
                        t = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(t)
                        if not last:
                            t = nn.relu(t)
                acc = acc + t
            fused.append(nn.relu(acc))
        return fused


class HRNet(Backbone):
    """HRNet backbone; returns the highest-resolution (stride-4) NHWC feature.

    ``stage_cfg`` is a nested tuple-ified version of the reference stage dict
    (see ``hrnet_w32``/``hrnet_w48`` below).
    """

    stage_cfg: Any = None
    in_channels: int = 3
    dtype: Dtype = jnp.float32
    # rematerialize exchange units in the backward pass: HRNet training is
    # HBM-bandwidth-bound on TPU (docs/performance.md), so trading activation
    # storage for recompute FLOPs can raise throughput
    remat: bool = False
    # space-to-depth stem: mathematically exact, checkpoint-compatible MXU-
    # dense rewrite of the two stride-2 stem convs (models/backbones/s2d.py)
    stem_s2d: bool = False
    # <1.0: train-mode BN statistics from a leading batch slice (a documented
    # TPU-first deviation, see SubsampledBatchNorm in models/common.py)
    bn_stats_frac: float = 1.0
    bn_grad_stats: str = "exact"
    # exact s2d rewrite of branch-0 BasicBlock chains (see HRModule) — a
    # bottom-up (large-input) win; off by default for top-down shapes
    branch0_s2d: bool = False

    @property
    def out_channels(self) -> int:
        return self.stage_cfg["stage4"]["num_channels"][0]

    def _stage_channels(self, cfg) -> Tuple[int, ...]:
        exp = _expansion(cfg["block"])
        return tuple(c * exp for c in cfg["num_channels"])

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        if self.stem_s2d:
            from .s2d import s2d_stem_apply

            x = s2d_stem_apply(x, train, self.dtype, self.in_channels,
                               stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)
        else:
            # stem: two strided 3x3 convs -> /4 resolution
            x = conv3x3(64, 2, self.dtype, name="stem_conv1")(x)
            x = batch_norm(train, self.dtype, name="stem_bn1", stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(x)
            x = nn.relu(x)
            x = conv3x3(64, 2, self.dtype, name="stem_conv2")(x)
            x = batch_norm(train, self.dtype, name="stem_bn2", stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(x)
            x = nn.relu(x)

        # stage 1: bottleneck layer
        cfg1 = self.stage_cfg["stage1"]
        block_cls = _BLOCKS[cfg1["block"]]
        ch1 = cfg1["num_channels"][0]
        x = block_cls(
            ch1, downsample=True, dtype=self.dtype,
            bn_stats_frac=self.bn_stats_frac,
            bn_grad_stats=self.bn_grad_stats,
        )(x, train)
        for _ in range(1, cfg1["num_blocks"][0]):
            x = block_cls(
                ch1, dtype=self.dtype, bn_stats_frac=self.bn_stats_frac,
                bn_grad_stats=self.bn_grad_stats,
            )(x, train)
        pre_channels = (ch1 * _expansion(cfg1["block"]),)

        xs = [x]
        for stage_name in ("stage2", "stage3", "stage4"):
            cfg = self.stage_cfg[stage_name]
            cur_channels = self._stage_channels(cfg)
            xs = self._transition(xs, pre_channels, cur_channels, train)
            multi_out = cfg.get("multiscale_output", True)
            # static_argnums: `train` (arg 2 incl. self) is a python bool
            module_cls = (
                nn.remat(HRModule, static_argnums=(2,)) if self.remat else HRModule
            )
            for m in range(cfg["num_modules"]):
                is_last_module = m == cfg["num_modules"] - 1
                xs = module_cls(
                    num_branches=cfg["num_branches"],
                    block=cfg["block"],
                    num_blocks=tuple(cfg["num_blocks"]),
                    in_channels=cur_channels,
                    num_channels=tuple(cfg["num_channels"]),
                    multi_scale_output=multi_out or not is_last_module,
                    dtype=self.dtype,
                    bn_stats_frac=self.bn_stats_frac,
                    bn_grad_stats=self.bn_grad_stats,
                    branch0_s2d=self.branch0_s2d,
                )(xs, train)
            pre_channels = cur_channels

        return xs[0]

    def _transition(self, xs, pre_channels, cur_channels, train: bool):
        """Create/adapt branches between stages (ref hrnet.py:440-496)."""
        out = []
        num_pre = len(pre_channels)
        for i, ch in enumerate(cur_channels):
            if i < num_pre:
                if ch != pre_channels[i]:
                    t = conv3x3(ch, 1, self.dtype)(xs[i])
                    t = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(t)
                    out.append(nn.relu(t))
                else:
                    out.append(xs[i])
            else:
                # new lower-resolution branch from the last previous branch
                t = xs[-1]
                for j in range(i + 1 - num_pre):
                    last = j == i - num_pre
                    c = ch if last else pre_channels[-1]
                    t = conv3x3(c, 2, self.dtype)(t)
                    t = batch_norm(train, self.dtype, stats_frac=self.bn_stats_frac, grad_stats=self.bn_grad_stats)(t)
                    t = nn.relu(t)
                out.append(t)
        return out


def _freeze_cfg(cfg: dict) -> dict:
    # flax module attributes must be hashable; tuple-ify nested lists
    from flax.core import FrozenDict

    def conv(v):
        if isinstance(v, dict):
            return FrozenDict({k: conv(x) for k, x in v.items()})
        if isinstance(v, (list, tuple)):
            return tuple(conv(x) for x in v)
        return v

    return conv(cfg)


def _w_cfg(width: int) -> dict:
    """Stage config literal for HRNet-W<width> (ref hrnet.py:617-718)."""
    return {
        "stage1": {
            "num_modules": 1,
            "num_branches": 1,
            "block": "BOTTLENECK",
            "num_blocks": (4,),
            "num_channels": (64,),
        },
        "stage2": {
            "num_modules": 1,
            "num_branches": 2,
            "block": "BASIC",
            "num_blocks": (4, 4),
            "num_channels": (width, width * 2),
        },
        "stage3": {
            "num_modules": 4,
            "num_branches": 3,
            "block": "BASIC",
            "num_blocks": (4, 4, 4),
            "num_channels": (width, width * 2, width * 4),
        },
        "stage4": {
            "num_modules": 3,
            "num_branches": 4,
            "block": "BASIC",
            "num_blocks": (4, 4, 4, 4),
            "num_channels": (width, width * 2, width * 4, width * 8),
            "multiscale_output": False,
        },
    }


@register("backbone")
def hrnet_w32(
    pretrained: bool = False,
    ckpt_url: str = "",
    in_channels: int = 3,
    dtype: Dtype = jnp.float32,
    **kwargs: Any,
) -> HRNet:
    """HRNet-W32 (parity: /root/reference/mindpose/models/backbones/hrnet.py:617)."""
    return HRNet(stage_cfg=_freeze_cfg(_w_cfg(32)), in_channels=in_channels,
                 dtype=dtype, remat=bool(kwargs.get("remat", False)),
                 stem_s2d=bool(kwargs.get("stem_s2d", False)),
                 bn_stats_frac=float(kwargs.get("bn_stats_frac", 1.0)),
                 bn_grad_stats=str(kwargs.get("bn_grad_stats", "exact")),
                 branch0_s2d=bool(kwargs.get("branch0_s2d", False)))


@register("backbone")
def hrnet_w48(
    pretrained: bool = False,
    ckpt_url: str = "",
    in_channels: int = 3,
    dtype: Dtype = jnp.float32,
    **kwargs: Any,
) -> HRNet:
    """HRNet-W48 (parity: /root/reference/mindpose/models/backbones/hrnet.py:669)."""
    return HRNet(stage_cfg=_freeze_cfg(_w_cfg(48)), in_channels=in_channels,
                 dtype=dtype, remat=bool(kwargs.get("remat", False)),
                 stem_s2d=bool(kwargs.get("stem_s2d", False)),
                 bn_stats_frac=float(kwargs.get("bn_stats_frac", 1.0)),
                 bn_grad_stats=str(kwargs.get("bn_grad_stats", "exact")),
                 branch0_s2d=bool(kwargs.get("branch0_s2d", False)))

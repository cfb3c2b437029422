"""Convert published backbone checkpoints into this framework's flax trees.

The reference's benchmark numbers all start from ImageNet-pretrained
backbones (configs/*/*_ascend.yaml `backbone_pretrained: true` +
`backbone_ckpt_url`; loader at /root/reference/mindpose/models/backbones/
utils.py:10-42). This module maps a source state dict — MindSpore .ckpt
(parsed by utils/ms_ckpt.py, no MindSpore runtime) or a torch/torchvision
.pth — onto our flax param/batch_stats trees.

The mapping is generated programmatically in the exact call order of our
`nn.compact` modules (flax auto-numbers anonymous submodules by trace
order), so it stays correct as long as the architectures themselves match
the reference topology — which the param-count tests pin.

Layout changes applied per tensor:
  conv kernel  [O, I, kh, kw]  ->  [kh, kw, I, O]
  bn gamma/weight -> params/.../scale, beta/bias -> bias,
  moving_mean/running_mean -> batch_stats/.../mean, variance -> var
"""
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

__all__ = [
    "normalize_source_keys",
    "backbone_mapping",
    "convert_backbone_state",
    "export_backbone_state",
    "export_vit_state",
    "SUPPORTED_ARCHS",
]

# entry: (kind, src_prefix, flax_path) where kind is "conv" | "bn";
# src_prefix is torch-style ("layer1.0.conv1"), flax_path a tuple of module
# names under the backbone scope ("Bottleneck_0", "Conv_0")
Entry = Tuple[str, str, Tuple[str, ...]]

_MS_RENAMES = (
    (".gamma", ".weight"),
    (".beta", ".bias"),
    (".moving_mean", ".running_mean"),
    (".moving_variance", ".running_var"),
    (".down_sample.", ".downsample."),
    ("last_norm.", "norm."),  # ViTPose's name for the final trunk LayerNorm
)
_STRIP_PREFIXES = ("backbone.", "module.", "net.", "model.")


def normalize_source_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Canonicalize MindSpore/torch naming variants into torch-style keys."""
    out = {}
    for k, v in state.items():
        for pre in _STRIP_PREFIXES:
            if k.startswith(pre):
                k = k[len(pre):]
        for old, new in _MS_RENAMES:
            k = k.replace(old, new)
        out[k] = np.asarray(v)
    return out


def _residual_block(src: str, flax: Tuple[str, ...], n_convs: int,
                    downsample: bool) -> List[Entry]:
    entries: List[Entry] = []
    for c in range(n_convs):
        entries.append(("conv", f"{src}.conv{c + 1}", flax + (f"Conv_{c}",)))
        entries.append(("bn", f"{src}.bn{c + 1}", flax + (f"BatchNorm_{c}",)))
    if downsample:
        entries.append(
            ("conv", f"{src}.downsample.0", flax + (f"Conv_{n_convs}",)))
        entries.append(
            ("bn", f"{src}.downsample.1", flax + (f"BatchNorm_{n_convs}",)))
    return entries


def resnet_mapping(block_counts: Sequence[int]) -> List[Entry]:
    """ResNet-50/101/152 (ref resnet.py:142-339; torchvision naming)."""
    entries: List[Entry] = [
        ("conv", "conv1", ("conv1",)),
        ("bn", "bn1", ("bn1",)),
    ]
    g = 0
    for stage, count in enumerate(block_counts):
        for i in range(count):
            entries += _residual_block(
                f"layer{stage + 1}.{i}", (f"Bottleneck_{g}",),
                n_convs=3, downsample=(i == 0))
            g += 1
    return entries


def _hrnet_stage_cfg(width: int) -> dict:
    return {
        2: dict(modules=1, branches=2, blocks=4,
                channels=(width, width * 2)),
        3: dict(modules=4, branches=3, blocks=4,
                channels=(width, width * 2, width * 4)),
        4: dict(modules=3, branches=4, blocks=4,
                channels=(width, width * 2, width * 4, width * 8),
                multiscale_output=False),
    }


def hrnet_mapping(width: int) -> List[Entry]:
    """HRNet-W32/W48 (ref hrnet.py:369-560; official HRNet torch naming).

    Follows our HRNet.__call__ trace order exactly: stem, stage-1
    bottlenecks, then per stage a transition (top-level Conv_c/BatchNorm_c
    counter) and its HRModules (branch blocks, then fusion convs in
    ascending (i, j) order — the same order `HRModule.__call__` creates
    them).
    """
    entries: List[Entry] = [
        ("conv", "conv1", ("stem_conv1",)),
        ("bn", "bn1", ("stem_bn1",)),
        ("conv", "conv2", ("stem_conv2",)),
        ("bn", "bn2", ("stem_bn2",)),
    ]
    for i in range(4):  # stage 1: 4 bottlenecks, first has downsample
        entries += _residual_block(
            f"layer1.{i}", (f"Bottleneck_{i}",), n_convs=3,
            downsample=(i == 0))

    cfgs = _hrnet_stage_cfg(width)
    pre_channels: Tuple[int, ...] = (256,)
    top_c = 0  # top-level transition Conv_c / BatchNorm_c counter
    h = 0  # HRModule counter
    for s in (2, 3, 4):
        cfg = cfgs[s]
        cur = cfg["channels"]
        t = s - 1
        # transition (ref _make_transition_layer / ours HRNet._transition)
        for i, ch in enumerate(cur):
            if i < len(pre_channels):
                if ch != pre_channels[i]:
                    entries.append(
                        ("conv", f"transition{t}.{i}.0", (f"Conv_{top_c}",)))
                    entries.append(
                        ("bn", f"transition{t}.{i}.1", (f"BatchNorm_{top_c}",)))
                    top_c += 1
            else:
                for j in range(i + 1 - len(pre_channels)):
                    entries.append(("conv", f"transition{t}.{i}.{j}.0",
                                    (f"Conv_{top_c}",)))
                    entries.append(("bn", f"transition{t}.{i}.{j}.1",
                                    (f"BatchNorm_{top_c}",)))
                    top_c += 1

        n_br = cfg["branches"]
        n_blk = cfg["blocks"]
        multi_default = cfg.get("multiscale_output", True)
        for m in range(cfg["modules"]):
            mod = (f"HRModule_{h}",)
            src_mod = f"stage{s}.{m}"
            for b in range(n_br):
                for k in range(n_blk):
                    entries += _residual_block(
                        f"{src_mod}.branches.{b}.{k}",
                        mod + (f"BasicBlock_{b * n_blk + k}",),
                        n_convs=2, downsample=False)
            # fusion, in our trace order: ascending i then ascending j != i
            is_last = m == cfg["modules"] - 1
            multi = multi_default or not is_last
            fc = 0
            for i in range(n_br if multi else 1):
                for j in range(n_br):
                    if j == i:
                        continue
                    if j > i:
                        entries.append(("conv", f"{src_mod}.fuse_layers.{i}.{j}.0",
                                        mod + (f"Conv_{fc}",)))
                        entries.append(("bn", f"{src_mod}.fuse_layers.{i}.{j}.1",
                                        mod + (f"BatchNorm_{fc}",)))
                        fc += 1
                    else:
                        for k in range(i - j):
                            entries.append(
                                ("conv", f"{src_mod}.fuse_layers.{i}.{j}.{k}.0",
                                 mod + (f"Conv_{fc}",)))
                            entries.append(
                                ("bn", f"{src_mod}.fuse_layers.{i}.{j}.{k}.1",
                                 mod + (f"BatchNorm_{fc}",)))
                            fc += 1
            h += 1
        pre_channels = cur
    return entries


SUPPORTED_ARCHS: Dict[str, Callable[[], List[Entry]]] = {
    "resnet50": lambda: resnet_mapping((3, 4, 6, 3)),
    "resnet101": lambda: resnet_mapping((3, 4, 23, 3)),
    "resnet152": lambda: resnet_mapping((3, 8, 36, 3)),
    "hrnet_w32": lambda: hrnet_mapping(32),
    "hrnet_w48": lambda: hrnet_mapping(48),
}

# ViT trunks convert through a dedicated path (qkv split + pos-embed grid),
# not conv/bn entries. Shapes follow timm/ViTPose/MAE torch naming.
VIT_ARCHS: Dict[str, Dict[str, int]] = {
    "vit_b": dict(hidden=768, heads=12, depth=12),
    "vit_s": dict(hidden=384, heads=6, depth=12),
    "vit_l": dict(hidden=1024, heads=16, depth=24),
    "vit_h": dict(hidden=1280, heads=16, depth=32),
}


def backbone_mapping(arch: str) -> List[Entry]:
    if arch not in SUPPORTED_ARCHS:
        raise ValueError(
            f"unsupported arch {arch!r}; choose from "
            f"{sorted(SUPPORTED_ARCHS) + sorted(VIT_ARCHS)}")
    return SUPPORTED_ARCHS[arch]()


def _infer_token_grid(n_tokens: int) -> Tuple[int, int]:
    """Factor a token count into (gh, gw): square, else 4:3 portrait (the
    pose-crop aspect — ViTPose 256x192 -> 16x12), else error."""
    r = int(round(n_tokens ** 0.5))
    if r * r == n_tokens:
        return r, r
    h = int(round((n_tokens * 4 / 3) ** 0.5))
    if h > 0 and n_tokens % h == 0:
        return h, n_tokens // h
    raise ValueError(
        f"cannot infer a token grid for {n_tokens} tokens — pass grid=(gh, gw)")


def convert_vit_state(
    arch: str, source: Dict[str, np.ndarray],
    grid: "Tuple[int, int] | None" = None,
) -> Tuple[dict, List[str], List[str]]:
    """Map a torch-style ViT state dict (timm/ViTPose/MAE naming) onto our
    flax ViT tree (models/backbones/vit.py).

    Layout changes: torch Linear [O, I] -> flax Dense kernel [I, O]; the
    fused qkv [3D, D] splits into query/key/value kernels [D, heads, hd];
    attn.proj [D, D] -> out kernel [heads, hd, D]; patch_embed conv
    [D, 3, p, p] -> [p, p, 3, D]; pos_embed [1, (1+)N, D] drops the class
    token (our trunk has none) and reshapes to the (1, gh, gw, D) grid.
    """
    cfg = VIT_ARCHS[arch]
    d, heads, depth = cfg["hidden"], cfg["heads"], cfg["depth"]
    hd = d // heads
    src = normalize_source_keys(source)
    params: dict = {}
    missing: List[str] = []
    used = set()

    def take(key: str):
        if key in src:
            used.add(key)
            return np.asarray(src[key], dtype=np.float32)
        missing.append(key)
        return None

    def dense(src_key: str, path: Tuple[str, ...]):
        w, b = take(f"{src_key}.weight"), take(f"{src_key}.bias")
        if w is not None:
            _set(params, path, "kernel", w.T)
        if b is not None:
            _set(params, path, "bias", b)

    def lnorm(src_key: str, path: Tuple[str, ...]):
        g, b = take(f"{src_key}.weight"), take(f"{src_key}.bias")
        if g is not None:
            _set(params, path, "scale", g)
        if b is not None:
            _set(params, path, "bias", b)

    w = take("patch_embed.proj.weight")
    if w is not None:
        _set(params, ("patch_embed",), "kernel", np.transpose(w, (2, 3, 1, 0)))
    b = take("patch_embed.proj.bias")
    if b is not None:
        _set(params, ("patch_embed",), "bias", b)

    pos = take("pos_embed")
    if pos is not None:
        n = pos.shape[1]
        gh, gw = grid if grid is not None else _infer_token_grid(
            n - 1 if _infer_ok(n) is None else n)
        if n == gh * gw + 1:  # leading class token (MAE/timm) — drop it
            pos = pos[:, 1:]
        elif n != gh * gw:
            raise ValueError(
                f"pos_embed has {n} tokens; grid {gh}x{gw} wants "
                f"{gh * gw} (+1 cls)")
        params["pos_embedding"] = pos.reshape(1, gh, gw, d)

    for i in range(depth):
        blk = f"block_{i}"
        lnorm(f"blocks.{i}.norm1", (blk, "LayerNorm_0"))
        lnorm(f"blocks.{i}.norm2", (blk, "LayerNorm_1"))
        attn = (blk, "MultiHeadDotProductAttention_0")
        qkv_w = take(f"blocks.{i}.attn.qkv.weight")
        qkv_b = take(f"blocks.{i}.attn.qkv.bias")
        if qkv_w is not None:
            for j, name in enumerate(("query", "key", "value")):
                wj = qkv_w[j * d:(j + 1) * d]  # [D_out, D_in]
                _set(params, attn + (name,), "kernel",
                     wj.T.reshape(d, heads, hd))
        if qkv_b is not None:
            for j, name in enumerate(("query", "key", "value")):
                _set(params, attn + (name,), "bias",
                     qkv_b[j * d:(j + 1) * d].reshape(heads, hd))
        pw = take(f"blocks.{i}.attn.proj.weight")
        pb = take(f"blocks.{i}.attn.proj.bias")
        if pw is not None:
            _set(params, attn + ("out",), "kernel",
                 pw.T.reshape(heads, hd, d))
        if pb is not None:
            _set(params, attn + ("out",), "bias", pb)
        dense(f"blocks.{i}.mlp.fc1", (blk, "MlpBlock_0", "Dense_0"))
        dense(f"blocks.{i}.mlp.fc2", (blk, "MlpBlock_0", "Dense_1"))
    lnorm("norm", ("norm",))

    unused = sorted(set(src) - used)
    return {"params": params, "batch_stats": {}}, missing, unused


def _infer_ok(n: int):
    """Return (gh, gw) if ``n`` factors cleanly as a token grid, else None."""
    try:
        return _infer_token_grid(n)
    except ValueError:
        return None


def _set(tree: dict, path: Tuple[str, ...], leaf: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def export_backbone_state(
    arch: str, variables: dict, naming: str = "torch"
) -> Dict[str, np.ndarray]:
    """Inverse of convert_backbone_state: flax trees -> torch/MS state dict.

    Exports this framework's trained backbones to the published-checkpoint
    ecosystem (and closes the loop for round-trip tests: export -> .ckpt ->
    convert must be bit-exact). ``naming`` picks torch-style keys
    ("layer1.0.bn1.weight") or MindSpore-style ("...bn1.gamma").
    """
    from flax.traverse_util import flatten_dict

    if arch in VIT_ARCHS:
        return export_vit_state(arch, variables, naming=naming)
    params = flatten_dict(variables.get("params", {}))
    stats = flatten_dict(variables.get("batch_stats", {}))
    ms = naming == "mindspore"
    # (torch leaf, MS leaf) for BN tensors; conv .weight is .weight in both
    bn_leaves = (("weight", "gamma"), ("bias", "beta"),
                 ("running_mean", "moving_mean"),
                 ("running_var", "moving_variance"))
    out: Dict[str, np.ndarray] = {}

    def emit(prefix: str, leaf: str, value: np.ndarray) -> None:
        if ms:
            prefix = prefix.replace(".downsample.", ".down_sample.")
        out[f"{prefix}.{leaf}"] = np.asarray(value)

    for kind, sp, fp in backbone_mapping(arch):
        if kind == "conv":
            w = params[fp + ("kernel",)]  # [kh, kw, I, O] -> [O, I, kh, kw]
            emit(sp, "weight", np.transpose(w, (3, 2, 0, 1)))
        else:
            names = [m if ms else t for t, m in bn_leaves]
            emit(sp, names[0], params[fp + ("scale",)])
            emit(sp, names[1], params[fp + ("bias",)])
            emit(sp, names[2], stats[fp + ("mean",)])
            emit(sp, names[3], stats[fp + ("var",)])
    return out


def export_vit_state(
    arch: str, variables: dict, naming: str = "torch"
) -> Dict[str, np.ndarray]:
    """Inverse of convert_vit_state: flax ViT tree -> torch-style state dict.

    Exact inverses of the layout changes documented there: Dense kernels
    transpose back to [O, I]; query/key/value kernels re-fuse into the
    [3D, D] qkv; the out kernel flattens back to [D, D]; the pos-embed grid
    flattens to [1, N, D] (no class token — our trunk has none).
    ``naming="mindspore"`` emits gamma/beta for LayerNorms and ViTPose's
    ``last_norm`` prefix; both flavors round-trip through
    :func:`normalize_source_keys`.
    """
    cfg = VIT_ARCHS[arch]
    d, depth = cfg["hidden"], cfg["depth"]
    params = variables.get("params", variables)
    ms = naming == "mindspore"
    ln_leaves = ("gamma", "beta") if ms else ("weight", "bias")
    out: Dict[str, np.ndarray] = {}

    def ln(src_key: str, node: dict) -> None:
        out[f"{src_key}.{ln_leaves[0]}"] = np.asarray(node["scale"])
        out[f"{src_key}.{ln_leaves[1]}"] = np.asarray(node["bias"])

    pe = params["patch_embed"]
    out["patch_embed.proj.weight"] = np.transpose(
        np.asarray(pe["kernel"]), (3, 2, 0, 1))
    out["patch_embed.proj.bias"] = np.asarray(pe["bias"])
    pos = np.asarray(params["pos_embedding"])  # [1, gh, gw, D]
    out["pos_embed"] = pos.reshape(1, -1, pos.shape[-1])

    for i in range(depth):
        blk = params[f"block_{i}"]
        ln(f"blocks.{i}.norm1", blk["LayerNorm_0"])
        ln(f"blocks.{i}.norm2", blk["LayerNorm_1"])
        attn = blk["MultiHeadDotProductAttention_0"]
        out[f"blocks.{i}.attn.qkv.weight"] = np.concatenate(
            [np.asarray(attn[n]["kernel"]).reshape(d, d).T
             for n in ("query", "key", "value")], axis=0)
        out[f"blocks.{i}.attn.qkv.bias"] = np.concatenate(
            [np.asarray(attn[n]["bias"]).reshape(d)
             for n in ("query", "key", "value")])
        out[f"blocks.{i}.attn.proj.weight"] = (
            np.asarray(attn["out"]["kernel"]).reshape(d, d).T)
        out[f"blocks.{i}.attn.proj.bias"] = np.asarray(attn["out"]["bias"])
        mlp = blk["MlpBlock_0"]
        out[f"blocks.{i}.mlp.fc1.weight"] = np.asarray(
            mlp["Dense_0"]["kernel"]).T
        out[f"blocks.{i}.mlp.fc1.bias"] = np.asarray(mlp["Dense_0"]["bias"])
        out[f"blocks.{i}.mlp.fc2.weight"] = np.asarray(
            mlp["Dense_1"]["kernel"]).T
        out[f"blocks.{i}.mlp.fc2.bias"] = np.asarray(mlp["Dense_1"]["bias"])

    ln("last_norm" if ms else "norm", params["norm"])
    return out


def convert_backbone_state(
    arch: str, source: Dict[str, np.ndarray]
) -> Tuple[dict, List[str], List[str]]:
    """Map a normalized source state dict onto flax trees.

    Returns (variables, missing_source_keys, unused_source_keys) where
    variables = {"params": ..., "batch_stats": ...} rooted at the backbone
    scope (ready for utils/checkpoint.py:load_pretrained_backbone).
    """
    if arch in VIT_ARCHS:
        return convert_vit_state(arch, source)
    src = normalize_source_keys(source)
    params: dict = {}
    stats: dict = {}
    missing: List[str] = []
    used = set()

    def take(key: str):
        if key in src:
            used.add(key)
            return np.asarray(src[key], dtype=np.float32)
        missing.append(key)
        return None

    for kind, sp, fp in backbone_mapping(arch):
        if kind == "conv":
            w = take(f"{sp}.weight")
            if w is not None:
                if w.ndim != 4:
                    raise ValueError(f"{sp}.weight has ndim {w.ndim}, want 4")
                _set(params, fp, "kernel", np.transpose(w, (2, 3, 1, 0)))
        else:
            g = take(f"{sp}.weight")
            b = take(f"{sp}.bias")
            mean = take(f"{sp}.running_mean")
            var = take(f"{sp}.running_var")
            if g is not None:
                _set(params, fp, "scale", g)
            if b is not None:
                _set(params, fp, "bias", b)
            if mean is not None:
                _set(stats, fp, "mean", mean)
            if var is not None:
                _set(stats, fp, "var", var)

    unused = sorted(set(src) - used)
    return {"params": params, "batch_stats": stats}, missing, unused

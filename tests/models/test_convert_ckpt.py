"""Pretrained-backbone conversion: MS .ckpt wire format + key mapping.

The synthetic-source round trip is the strong assertion here: for each arch
we derive a MindSpore-style state dict from the mapping itself, convert it,
and require the result to cover EVERY leaf of the live backbone's init tree
with matching shapes — so any drift between the mapping's trace-order
bookkeeping and the real flax module structure fails loudly.
"""
import os
import sys

import jax
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

sys.path.insert(0, "tests")

from mindpose_tpu.models.backbones.convert import (
    backbone_mapping,
    convert_backbone_state,
)
from mindpose_tpu.models.model_factory import create_backbone
from mindpose_tpu.utils.ms_ckpt import read_ms_checkpoint, write_ms_checkpoint

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow



def test_ms_ckpt_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "conv1.weight": rng.standard_normal((8, 3, 3, 3)).astype(np.float32),
        "bn1.gamma": rng.standard_normal(8).astype(np.float32),
        "scalar": np.float32(3.25).reshape(()),
        "ints": np.arange(5, dtype=np.int32),
        "half": rng.standard_normal((2, 2)).astype(np.float16),
    }
    path = str(tmp_path / "test.ckpt")
    write_ms_checkpoint(path, tensors)
    got = read_ms_checkpoint(path)
    assert set(got) == set(tensors)
    for k in tensors:
        assert got[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(got[k], tensors[k])


def _init_backbone(arch):
    net = create_backbone(arch)
    return jax.device_get(
        net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32),
                 train=False)
    )


def _synthetic_ms_source(arch, init):
    """Build an MS-style source dict with shapes derived from the mapping."""
    rng = np.random.default_rng(7)
    flat = flatten_dict(init)
    src = {}
    for kind, sp, fp in backbone_mapping(arch):
        ms = sp.replace(".downsample.", ".down_sample.")
        # magnitudes chosen so a 50-layer forward stays finite
        if kind == "conv":
            kern = flat[("params",) + fp + ("kernel",)]
            kh, kw, i, o = kern.shape
            fan_in = kh * kw * i
            src[f"backbone.{ms}.weight"] = (
                rng.standard_normal((o, i, kh, kw)) / np.sqrt(fan_in)
            ).astype(np.float32)
        else:
            n = flat[("params",) + fp + ("scale",)].shape[0]
            src[f"backbone.{ms}.gamma"] = rng.uniform(0.8, 1.2, n).astype(
                np.float32)
            src[f"backbone.{ms}.beta"] = (0.1 * rng.standard_normal(n)).astype(
                np.float32)
            src[f"backbone.{ms}.moving_mean"] = (
                0.1 * rng.standard_normal(n)).astype(np.float32)
            src[f"backbone.{ms}.moving_variance"] = rng.uniform(
                0.5, 2.0, n).astype(np.float32)
    return src


@pytest.mark.parametrize("arch", ["resnet50", "hrnet_w32"])
def test_convert_covers_every_init_leaf(arch):
    init = _init_backbone(arch)
    src = _synthetic_ms_source(arch, init)
    variables, missing, unused = convert_backbone_state(arch, src)
    assert missing == []
    assert unused == []

    init_flat = flatten_dict(init)
    got_flat = flatten_dict(variables)
    assert set(got_flat) == set(init_flat), (
        sorted(set(init_flat) - set(got_flat))[:5],
        sorted(set(got_flat) - set(init_flat))[:5],
    )
    for k, v in got_flat.items():
        assert tuple(v.shape) == tuple(init_flat[k].shape), k

    # spot-check the conv layout transpose: O,I,kh,kw -> kh,kw,I,O
    first_conv = "conv1" if arch == "resnet50" else "stem_conv1"
    w = src[f"backbone.{'conv1'}.weight"] if arch == "resnet50" else src[
        "backbone.conv1.weight"]
    np.testing.assert_array_equal(
        variables["params"][first_conv]["kernel"],
        np.transpose(w, (2, 3, 1, 0)),
    )

    # converted tree must run
    net = create_backbone(arch)
    out = net.apply(variables, np.zeros((1, 64, 64, 3), np.float32),
                    train=False)
    assert np.all(np.isfinite(np.asarray(out)))


def _synthetic_vit_source(d=384, heads=6, depth=12, grid=(4, 3), cls=True):
    """Torch-style (timm/ViTPose) ViT-S state dict with random weights."""
    rng = np.random.default_rng(11)
    s = lambda *shape: (rng.standard_normal(shape) / np.sqrt(shape[-1])
                        ).astype(np.float32)
    src = {
        "patch_embed.proj.weight": s(d, 3, 16, 16),
        "patch_embed.proj.bias": s(d),
        "pos_embed": 0.02 * s(1, grid[0] * grid[1] + (1 if cls else 0), d),
        "last_norm.weight": np.ones(d, np.float32),
        "last_norm.bias": np.zeros(d, np.float32),
    }
    for i in range(depth):
        src[f"blocks.{i}.norm1.weight"] = np.ones(d, np.float32)
        src[f"blocks.{i}.norm1.bias"] = np.zeros(d, np.float32)
        src[f"blocks.{i}.norm2.weight"] = np.ones(d, np.float32)
        src[f"blocks.{i}.norm2.bias"] = np.zeros(d, np.float32)
        src[f"blocks.{i}.attn.qkv.weight"] = s(3 * d, d)
        src[f"blocks.{i}.attn.qkv.bias"] = 0.02 * s(3 * d)
        src[f"blocks.{i}.attn.proj.weight"] = s(d, d)
        src[f"blocks.{i}.attn.proj.bias"] = 0.02 * s(d)
        src[f"blocks.{i}.mlp.fc1.weight"] = s(4 * d, d)
        src[f"blocks.{i}.mlp.fc1.bias"] = 0.02 * s(4 * d)
        src[f"blocks.{i}.mlp.fc2.weight"] = s(d, 4 * d)
        src[f"blocks.{i}.mlp.fc2.bias"] = 0.02 * s(d)
    return src


def _numpy_vit_forward(src, x, d=384, heads=6, depth=12, grid=(4, 3)):
    """Reference forward from the TORCH-layout weights (oracle for the
    conversion's transposes/splits). GELU is tanh-approx to match nn.gelu."""
    hd = d // heads
    gh, gw = grid

    def ln(v, w, b):
        mu = v.mean(-1, keepdims=True)
        var = v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-6) * w + b

    def gelu(v):
        return 0.5 * v * (1 + np.tanh(
            np.sqrt(2 / np.pi) * (v + 0.044715 * v ** 3)))

    # patch embed: conv stride 16 == per-patch linear
    kern = src["patch_embed.proj.weight"]  # [D, 3, 16, 16]
    n, H, W, _ = x.shape
    patches = x.reshape(n, gh, 16, gw, 16, 3).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(n, gh * gw, 16 * 16 * 3)
    w_flat = kern.transpose(2, 3, 1, 0).reshape(16 * 16 * 3, d)
    t = patches @ w_flat + src["patch_embed.proj.bias"]
    pos = src["pos_embed"]
    if pos.shape[1] == gh * gw + 1:
        pos = pos[:, 1:]
    t = t + pos
    for i in range(depth):
        y = ln(t, src[f"blocks.{i}.norm1.weight"],
               src[f"blocks.{i}.norm1.bias"])
        qkv = y @ src[f"blocks.{i}.attn.qkv.weight"].T + src[
            f"blocks.{i}.attn.qkv.bias"]
        q, k, v = np.split(qkv, 3, axis=-1)
        q = q.reshape(n, -1, heads, hd)
        k = k.reshape(n, -1, heads, hd)
        v = v.reshape(n, -1, heads, hd)
        logits = np.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(hd)
        a = np.exp(logits - logits.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        o = np.einsum("nhqk,nkhd->nqhd", a, v).reshape(n, -1, d)
        o = o @ src[f"blocks.{i}.attn.proj.weight"].T + src[
            f"blocks.{i}.attn.proj.bias"]
        t = t + o
        y = ln(t, src[f"blocks.{i}.norm2.weight"],
               src[f"blocks.{i}.norm2.bias"])
        y = gelu(y @ src[f"blocks.{i}.mlp.fc1.weight"].T + src[
            f"blocks.{i}.mlp.fc1.bias"])
        y = y @ src[f"blocks.{i}.mlp.fc2.weight"].T + src[
            f"blocks.{i}.mlp.fc2.bias"]
        t = t + y
    t = ln(t, src["last_norm.weight"], src["last_norm.bias"])
    return t.reshape(n, gh, gw, d)


def test_convert_vit_covers_init_and_matches_numpy_oracle():
    from mindpose_tpu.models.backbones.convert import convert_vit_state

    src = _synthetic_vit_source()
    variables, missing, unused = convert_vit_state("vit_s", src)
    assert missing == []
    assert unused == []

    net = create_backbone("vit_s")
    x = np.random.default_rng(3).uniform(-1, 1, (2, 64, 48, 3)).astype(
        np.float32)
    init = jax.device_get(
        net.init(jax.random.PRNGKey(0), x, train=False))
    init_flat = flatten_dict(init["params"])
    got_flat = flatten_dict(variables["params"])
    assert set(got_flat) == set(init_flat), (
        sorted(set(init_flat) - set(got_flat))[:5],
        sorted(set(got_flat) - set(init_flat))[:5],
    )
    for k, v in got_flat.items():
        assert tuple(v.shape) == tuple(init_flat[k].shape), k

    out = np.asarray(net.apply(variables, x, train=False))
    ref = _numpy_vit_forward(src, x)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


def test_convert_vit_infers_cls_token_grid():
    """A 12+1-token pos_embed (cls token) lands on the 4x3 grid."""
    from mindpose_tpu.models.backbones.convert import convert_vit_state

    src = _synthetic_vit_source(cls=True)
    variables, _, _ = convert_vit_state("vit_s", src)
    assert variables["params"]["pos_embedding"].shape == (1, 4, 3, 384)
    src2 = _synthetic_vit_source(cls=False)
    variables2, _, _ = convert_vit_state("vit_s", src2)
    assert variables2["params"]["pos_embedding"].shape == (1, 4, 3, 384)


def test_partial_source_reports_missing():
    init = _init_backbone("resnet50")
    src = _synthetic_ms_source("resnet50", init)
    dropped = [k for k in src if "layer3" in k]
    for k in dropped:
        del src[k]
    _, missing, _ = convert_backbone_state("resnet50", src)
    assert len(missing) == len(dropped)


def test_load_pretrained_backbone_via_msgpack(tmp_path):
    """Full integration: convert -> msgpack -> load into a composed net."""
    from flax import serialization

    import mindpose_tpu as mp
    from mindpose_tpu.utils.checkpoint import load_pretrained_backbone

    init = _init_backbone("resnet50")
    src = _synthetic_ms_source("resnet50", init)
    variables, missing, _ = convert_backbone_state("resnet50", src)
    assert not missing
    path = str(tmp_path / "resnet50_imagenet.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))

    net = mp.create_network("resnet50", "simple_baseline_head")
    full = jax.device_get(
        net.init(jax.random.PRNGKey(1), np.zeros((1, 64, 64, 3), np.float32),
                 train=False)
    )
    loaded = load_pretrained_backbone(path, full)

    np.testing.assert_array_equal(
        loaded["params"]["backbone"]["conv1"]["kernel"],
        variables["params"]["conv1"]["kernel"],
    )
    np.testing.assert_array_equal(
        loaded["batch_stats"]["backbone"]["bn1"]["mean"],
        variables["batch_stats"]["bn1"]["mean"],
    )
    # head untouched
    head_before = flatten_dict(full["params"]["head"])
    head_after = flatten_dict(loaded["params"]["head"])
    for k in head_before:
        np.testing.assert_array_equal(head_before[k], head_after[k])


def test_convert_ckpt_cli(tmp_path):
    """End-to-end CLI drive: .ckpt in, checked .msgpack out."""
    import subprocess

    init = _init_backbone("resnet50")
    src = _synthetic_ms_source("resnet50", init)
    ckpt = str(tmp_path / "resnet50_imagenet.ckpt")
    write_ms_checkpoint(ckpt, src)
    out = str(tmp_path / "resnet50_imagenet.msgpack")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/convert_ckpt.py", "--src", ckpt,
         "--arch", "resnet50", "--out", out, "--check"],
        # cold subprocess re-imports jax and re-compiles resnet50 init;
        # on a 1-core driver host that alone can exceed 600s
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isfile(out)


@pytest.mark.parametrize("naming", ["torch", "mindspore"])
def test_export_convert_roundtrip(naming, tmp_path):
    """flax init -> export -> .ckpt -> convert must be bit-exact."""
    from mindpose_tpu.models.backbones.convert import export_backbone_state

    init = _init_backbone("resnet50")
    exported = export_backbone_state("resnet50", init, naming=naming)
    leaf = "bn1.gamma" if naming == "mindspore" else "bn1.weight"
    assert leaf in exported and "conv1.weight" in exported

    ckpt = str(tmp_path / "export.ckpt")
    write_ms_checkpoint(ckpt, exported)
    variables, missing, unused = convert_backbone_state(
        "resnet50", read_ms_checkpoint(ckpt))
    assert missing == [] and unused == []

    init_flat = flatten_dict(init)
    got_flat = flatten_dict(variables)
    assert set(got_flat) == set(init_flat)
    for k in got_flat:
        np.testing.assert_array_equal(got_flat[k], np.asarray(init_flat[k]))


@pytest.mark.parametrize("naming", ["torch", "mindspore"])
def test_export_convert_vit_roundtrip(naming, tmp_path):
    """flax ViT init -> export -> .ckpt -> convert must be bit-exact."""
    from mindpose_tpu.models.backbones.convert import export_backbone_state

    init = _init_backbone("vit_s")
    exported = export_backbone_state("vit_s", init, naming=naming)
    norm_key = "last_norm.gamma" if naming == "mindspore" else "norm.weight"
    assert norm_key in exported and "pos_embed" in exported
    assert exported["blocks.0.attn.qkv.weight"].shape == (3 * 384, 384)

    ckpt = str(tmp_path / "vit_export.ckpt")
    write_ms_checkpoint(ckpt, exported)
    variables, missing, unused = convert_backbone_state(
        "vit_s", read_ms_checkpoint(ckpt))
    assert missing == [] and unused == []

    init_flat = flatten_dict(init["params"])
    got_flat = flatten_dict(variables["params"])
    assert set(got_flat) == set(init_flat)
    for k in got_flat:
        np.testing.assert_array_equal(got_flat[k], np.asarray(init_flat[k]))

"""Export a trained model to a self-contained StableHLO serving artifact.

The artifact bakes the weights in as constants and fuses forward + on-device
decode into one program with a symbolic batch dimension; it is loadable with
``jax.export.deserialize`` alone (no framework code, config or checkpoint at
serving time). The reference has no deployment path beyond MindSpore
checkpoint files re-assembled from YAML (/root/reference/tools/eval.py).

Usage:
    python tools/export.py --config configs/hrnet/hrnet_w32_tpu.yaml \
        --ckpt ckpt/hrnet_w32_tpu_best.ckpt --out hrnet_w32_serve.stablehlo \
        [--platforms tpu,cpu] [--batch b] [--raw] [--selftest]
"""
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from common.log import setup_default_logging
from mindpose_tpu.config import parse_args
from mindpose_tpu.engine import export_eval_net, load_serving_fn
from mindpose_tpu.models import (
    create_decoder,
    create_eval_network,
    create_network,
)


def build_eval_net(args, raw_output: bool):
    amp = getattr(args, "amp_level", "O0")
    dtype = jnp.bfloat16 if amp not in ("O0", None) else jnp.float32
    net = create_network(
        backbone_name=args.backbone_name,
        head_name=args.head_name,
        neck_name=getattr(args, "neck_name", "") or "",
        in_channels=getattr(args, "in_channels", 3),
        neck_out_channels=getattr(args, "neck_out_channels", None) or 256,
        num_joints=args.num_joints,
        backbone_args=getattr(args, "backbone_setting", None),
        neck_args=getattr(args, "neck_setting", None),
        head_args=getattr(args, "head_setting", None),
        dtype=dtype,
    )
    image_size = args.dataset_setting["image_size"]
    h, w = int(image_size[1]), int(image_size[0])
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.device_get(
        net.init(jax.random.PRNGKey(0), dummy, train=False))

    from mindpose_tpu.utils.checkpoint import load_variables

    variables = load_variables(args.ckpt, variables)

    decoder = create_decoder(
        args.decoder_name, **(getattr(args, "decoder_setting", None) or {})
    )
    eval_net = create_eval_network(net, decoder, output_raw=raw_output)
    return eval_net, variables, (h, w)


def main() -> None:
    setup_default_logging()
    args = parse_args(
        description="export a checkpoint to a StableHLO serving artifact",
        extra_args=[
            {"names": ["--out"], "type": str, "default": "",
             "help": "output path (default <config>.stablehlo)"},
            {"names": ["--platforms"], "type": str, "default": "tpu,cpu",
             "help": "comma-separated lowering platforms"},
            {"names": ["--batch"], "type": str, "default": "b",
             "help": "symbolic dim name (any batch) or an int to pin"},
            {"names": ["--raw"], "action": "store_true",
             "help": "also return raw heatmaps from the artifact"},
            {"names": ["--selftest"], "action": "store_true",
             "help": "deserialize and compare against direct apply"},
        ])
    if args.pipeline_method != "topdown":
        raise SystemExit(
            "export currently supports top-down recipes (the bottom-up "
            "decoder's host grouping stage is not a pure device program)")
    if not getattr(args, "ckpt", None):
        raise SystemExit("--ckpt is required")
    out = getattr(args, "out", "") or (
        os.path.splitext(os.path.basename(args.config))[0] + ".stablehlo")
    platforms = [p.strip() for p in str(
        getattr(args, "platforms", "") or "tpu,cpu").split(",")]
    batch = getattr(args, "batch", "b")
    if isinstance(batch, str) and batch.isdigit():
        batch = int(batch)
    raw_output = bool(getattr(args, "raw", False))

    eval_net, variables, image_hw = build_eval_net(args, raw_output)
    logging.info("exporting %s + %s decode at %sx%s, batch=%r, platforms=%s",
                 args.backbone_name, args.decoder_name, image_hw[0],
                 image_hw[1], batch, platforms)
    blob = export_eval_net(eval_net, variables, image_hw=image_hw,
                           batch=batch, platforms=platforms)
    with open(out, "wb") as f:
        f.write(blob)
    logging.info("wrote %s (%.1f MB)", out, len(blob) / 1e6)

    if getattr(args, "selftest", False):
        serve = load_serving_fn(blob)
        n = batch if isinstance(batch, int) else 2
        rng = np.random.RandomState(0)
        inputs = (
            rng.rand(n, *image_hw, 3).astype(np.float32),
            rng.uniform(50, 100, (n, 2)).astype(np.float32),
            rng.uniform(0.5, 2.0, (n, 2)).astype(np.float32),
            rng.rand(n).astype(np.float32),
        )
        got = jax.tree.leaves(serve(*inputs))
        want = jax.tree.leaves(eval_net.apply(variables, *inputs))
        assert len(got) == len(want)
        amp = getattr(args, "amp_level", "O0")
        for g, w in zip(got, want):
            g, w = np.asarray(g), np.asarray(w)
            assert np.all(np.isfinite(g)), "non-finite outputs in artifact"
            if amp in ("O0", None):
                np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4)
            else:
                # bf16 compute: different fusion orders in the exported
                # lowering can flip argmax ties on near-flat heatmaps, so
                # require bulk agreement rather than elementwise equality
                frac = float(np.mean(np.isclose(g, w, rtol=1e-2, atol=1e-2)))
                assert frac >= 0.9, (
                    f"artifact disagrees with direct apply on "
                    f"{1 - frac:.1%} of outputs (shape {g.shape})")
        logging.info("selftest ok: deserialized artifact matches direct "
                     "apply (batch %d, amp=%s)", n, amp)


if __name__ == "__main__":
    main()

"""Convert a published backbone checkpoint into this framework's format.

Sources:
  *.ckpt        MindSpore checkpoint (parsed natively, no MindSpore needed) —
                the format behind the reference's `backbone_ckpt_url`s
                (/root/reference/configs/hrnet/hrnet_w32_ascend.yaml).
  *.pth / *.pt  torch state dict (torchvision ResNet, official HRNet repos).
  *.npz         numpy archive of {torch-style-name: array}.

Output: a flax-msgpack file loadable by `backbone_ckpt_url` /
`utils/checkpoint.py:load_pretrained_backbone`.

Example:
  python tools/convert_ckpt.py --src hrnet_w32_imagenet.ckpt \
      --arch hrnet_w32 --out cache/pretrained/hrnet_w32_imagenet.msgpack
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

import numpy as np

from mindpose_tpu.models.backbones.convert import (
    SUPPORTED_ARCHS,
    VIT_ARCHS,
    convert_backbone_state,
)
from tools.common.log import setup_default_logging


def load_source(path: str) -> dict:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ckpt":
        from mindpose_tpu.utils.ms_ckpt import read_ms_checkpoint

        return read_ms_checkpoint(path)
    if ext in (".pth", ".pt", ".tar", ".bin"):
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
        for nest in ("state_dict", "model", "module"):
            if isinstance(state, dict) and nest in state and isinstance(
                state[nest], dict
            ):
                state = state[nest]
        return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in state.items()}
    if ext == ".npz":
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    raise ValueError(f"unrecognized checkpoint extension {ext!r} for {path!r}")


def check_against_init(arch: str, variables: dict) -> int:
    """Verify every converted leaf matches the live backbone's init shapes."""
    import jax
    import numpy as np

    from flax.traverse_util import flatten_dict

    from mindpose_tpu.models.model_factory import create_backbone

    net = create_backbone(arch)
    in_hw = (64, 64)
    if arch in VIT_ARCHS:
        # init at the resolution implied by the converted pos-embed grid so
        # the pos_embedding shapes line up (stride = patch 16)
        pos = variables["params"].get("pos_embedding")
        if pos is not None:
            in_hw = (pos.shape[1] * 16, pos.shape[2] * 16)
    init = net.init(
        jax.random.PRNGKey(0), np.zeros((1,) + in_hw + (3,), np.float32),
        train=False)
    init_flat = flatten_dict(jax.device_get(init))
    got_flat = flatten_dict(variables)
    bad = 0
    for k, v in got_flat.items():
        ref = init_flat.get(k)
        if ref is None:
            logging.error("converted leaf %s has no home in %s", "/".join(k), arch)
            bad += 1
        elif tuple(ref.shape) != tuple(v.shape):
            logging.error("shape mismatch at %s: got %s want %s",
                          "/".join(k), v.shape, ref.shape)
            bad += 1
    n_missing = len(init_flat) - len(got_flat)
    logging.info("verified %d leaves against %s init (%d init leaves not "
                 "covered — heads/necks are expected to be uncovered when "
                 "converting a backbone-only checkpoint)",
                 len(got_flat), arch, n_missing)
    return bad


def main() -> None:
    setup_default_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="source checkpoint path")
    p.add_argument("--arch", required=True,
                   choices=sorted(SUPPORTED_ARCHS) + sorted(VIT_ARCHS))
    p.add_argument("--out", required=True, help="output .msgpack path")
    p.add_argument("--check", action="store_true",
                   help="instantiate the backbone and verify leaf shapes")
    p.add_argument("--allow-missing", action="store_true",
                   help="tolerate source keys the mapping expects but "
                        "cannot find (loads partially, like the reference's "
                        "non-strict load_param_into_net)")
    args = p.parse_args()

    source = load_source(args.src)
    logging.info("loaded %d tensors from %s", len(source), args.src)
    variables, missing, unused = convert_backbone_state(args.arch, source)
    if missing:
        level = logging.warning if args.allow_missing else logging.error
        level("%d expected source keys missing (first 10): %s",
              len(missing), missing[:10])
        if not args.allow_missing:
            raise SystemExit(
                "conversion incomplete — rerun with --allow-missing to "
                "accept a partial (non-strict) load")
    if unused:
        logging.info("%d source tensors unused (classifier heads etc.); "
                     "first 10: %s", len(unused), unused[:10])

    if args.check and check_against_init(args.arch, variables):
        raise SystemExit("shape check failed")

    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    logging.info("wrote %s (arch=%s); use it via backbone_pretrained: true + "
                 "backbone_ckpt_url: %s", args.out, args.arch, args.out)


if __name__ == "__main__":
    main()

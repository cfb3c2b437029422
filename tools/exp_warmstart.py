"""Converted-pretrained-backbone warm start vs from-scratch, equal steps.

The reference's published numbers all start from ImageNet-pretrained
backbones (configs/*/*_ascend.yaml `backbone_pretrained: true`; loader at
/root/reference/mindpose/models/backbones/utils.py:10-42). No published
checkpoint can be downloaded in this environment, so this experiment proves
the mechanism end-to-end through the REAL conversion pipeline instead:

  1. pretrain a backbone on synthetic domain A (different render seed),
  2. export it with export_backbone_state -> write_ms_checkpoint
     (a genuine MindSpore-wire .ckpt, like a published one),
  3. convert with tools/convert_ckpt.py (the CLI a user would run),
  4. train on domain B from scratch vs from the converted init at equal
     steps, paired seeds, and compare held-out AP trajectories.

A user with the real `hrnet_w32_imagenet.ckpt` runs exactly steps 3-4.

Example:
    python tools/exp_warmstart.py --epochs 60 --pretrain-epochs 60 \
        --out docs/experiments/warmstart_r3.json
"""
import argparse
import json
import logging
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

import numpy as np

from mindpose_tpu.utils.cache import enable_compilation_cache
from tools.ablate_accuracy import (
    eval_checkpoint,
    make_data,
    train_arm,
)
from tools.common.log import setup_default_logging
from tools.make_synthetic_coco import generate_split


def build_pretrained_ckpt(root: str, arch: str, head: str, epochs: int,
                          batch_size: int, train_images: int = 160) -> str:
    """Pretrain on domain A, export through the real .ckpt + converter path."""
    import jax

    from mindpose_tpu.models.backbones.convert import export_backbone_state
    from mindpose_tpu.utils.ms_ckpt import write_ms_checkpoint

    dom_a = os.path.join(root, "domain_a")
    generate_split(os.path.join(dom_a, "train"), train_images, seed=50,
                   people_per_img=3)
    data_a = {"train": (os.path.join(dom_a, "train", "images"),
                        os.path.join(dom_a, "train", "annotations.json"))}
    logging.info("pretraining %s on domain A (%d epochs)...", arch, epochs)
    net, state = train_arm("plain", 100, data_a, epochs, batch_size, arch,
                           head)

    backbone_vars = {
        "params": jax.device_get(state.params)["backbone"],
        "batch_stats": jax.device_get(state.batch_stats)["backbone"],
    }
    exported = export_backbone_state(arch, backbone_vars, naming="mindspore")
    ckpt = os.path.join(root, f"{arch}_domain_a.ckpt")
    write_ms_checkpoint(ckpt, exported)
    logging.info("wrote MindSpore-wire checkpoint %s (%d tensors)",
                 ckpt, len(exported))

    msgpack = os.path.join(root, f"{arch}_domain_a.msgpack")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "convert_ckpt.py"),
         "--src", ckpt, "--arch", arch, "--out", msgpack, "--check"],
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        raise RuntimeError(f"convert_ckpt failed:\n{r.stderr[-2000:]}")
    logging.info("converted via tools/convert_ckpt.py -> %s", msgpack)
    return msgpack


def main() -> None:
    setup_default_logging()
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="hrnet_w32")
    p.add_argument("--head", default="hrnet_head")
    p.add_argument("--epochs", type=int, default=60,
                   help="domain-B training epochs per arm")
    p.add_argument("--pretrain-epochs", type=int, default=60)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seeds", default="0,1")
    p.add_argument("--eval-every", type=int, default=15)
    p.add_argument("--train-images", type=int, default=160)
    p.add_argument("--val-images", type=int, default=240)
    p.add_argument("--data-root", default="")
    p.add_argument("--out", default="")
    args = p.parse_args()

    root = args.data_root or tempfile.mkdtemp(prefix="warmstart_")
    msgpack = os.path.join(root, f"{args.arch}_domain_a.msgpack")
    if not os.path.exists(msgpack):
        msgpack = build_pretrained_ckpt(root, args.arch, args.head,
                                        args.pretrain_epochs, args.batch_size,
                                        args.train_images)

    dom_b = os.path.join(root, "domain_b")
    data_b = make_data(dom_b, args.train_images, args.val_images, 3)

    runs = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        for init, path in (("scratch", ""), ("converted", msgpack)):
            traj = {}

            def at_milestone(epoch, net, state, _traj=traj):
                if epoch % args.eval_every == 0 or epoch == args.epochs:
                    r = eval_checkpoint(net, state, data_b,
                                        {"shift_coordinate": False})
                    _traj[epoch] = float(r["AP"])
                    logging.info("[%s seed=%d] ep%d AP=%.4f",
                                 init, seed, epoch, _traj[epoch])

            train_arm("plain", seed, data_b, args.epochs, args.batch_size,
                      args.arch, args.head, pretrained_path=path,
                      milestone_eval=at_milestone)
            rec = {"init": init, "seed": seed, "trajectory": traj,
                   "final_AP": traj.get(args.epochs)}
            runs.append(rec)
            print(json.dumps(rec), flush=True)

    by_init = {}
    for r in runs:
        by_init.setdefault(r["init"], []).append(r["final_AP"])
    deltas = [c - s for c, s in zip(by_init.get("converted", []),
                                    by_init.get("scratch", []))]
    summary = {
        k: {"mean": round(float(np.mean(v)), 4),
            "std": round(float(np.std(v)), 4), "aps": v}
        for k, v in by_init.items()
    }
    if deltas:
        summary["paired_delta_converted_minus_scratch"] = {
            "mean": round(float(np.mean(deltas)), 4),
            "per_seed": [round(d, 4) for d in deltas],
        }
    report = {"protocol": vars(args), "runs": runs, "summary": summary}
    print(json.dumps({"summary": summary}, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        logging.info("wrote %s", args.out)


if __name__ == "__main__":
    main()

"""Bottom-up (HigherHRNet-W32 512x512) train-step variant comparison.

Times the exact bench.py bottom-up step with backbone variants, so BN /
remat experiments are measured on the production step rather than a proxy.
Variants with exact numerics: base, bnfused (custom-vjp exact BN backward),
remat (exchange-unit rematerialization). bnfrozen is divergent (see
docs/performance.md) and included only as a speed bound.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

from mindpose_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import bench

# (backbone_args, head_args) per variant; s2d refers to the head's
# space-to-depth refinement stage (exact rewrite, default-on)
VARIANTS = {
    "base": ({}, {"s2d_refine": False}),
    "bnfused": ({"bn_grad_stats": "fused"}, {"s2d_refine": False}),
    "bnfrozen": ({"bn_grad_stats": "frozen"}, {"s2d_refine": False}),
    "remat": ({"remat": True}, {"s2d_refine": False}),
    "s2d": ({}, {}),
    "s2d_bnfused": ({"bn_grad_stats": "fused"}, {}),
    "s2d_b0": ({"branch0_s2d": True}, {}),
    "s2d_b0_bnfused": ({"branch0_s2d": True, "bn_grad_stats": "fused"}, {}),
    "s2d_b0_stem": ({"branch0_s2d": True, "stem_s2d": True,
                     "bn_grad_stats": "fused"}, {}),
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,bnfused")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    for name in args.variants.split(","):
        bargs, hargs = VARIANTS[name]
        r = bench.bench_bottomup_step(
            batch_per_chip=args.batch, iters=args.iters,
            backbone_args=bargs, head_args=hargs)
        print(f"higher_hrnet/{name:14s} "
              f"{r['higher_hrnet_step_time_ms']:8.2f} ms/step   "
              f"{r['higher_hrnet_train_images_per_sec_per_chip']:7.1f} img/s/chip",
              flush=True)

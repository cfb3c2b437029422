"""Quick train-step throughput comparison across model/config variants."""
import argparse, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()
import jax, jax.numpy as jnp, numpy as np
from mindpose_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import mindpose_tpu as mp
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.parallel import build_train_step, create_train_state


def bench(backbone_args, B=128, iters=20, backbone="hrnet_w32",
          head="hrnet_head", head_args=None, accum=1):
    net = mp.create_network(backbone, head, dtype=jnp.bfloat16,
                            backbone_args=backbone_args,
                            head_args=head_args or {})
    rng = np.random.RandomState(0)
    if head == "simcc_head":
        # bin-label targets, KL loss (configs/simcc)
        ratio = (head_args or {}).get("split_ratio", 2.0)
        bins = int(192 * ratio) + int(256 * ratio)
        loss = mp.create_loss("kl_discret", use_target_weight=True)
        y = rng.rand(B, 17, bins).astype(np.float32)
        y /= y.sum(-1, keepdims=True)
    else:
        loss = mp.create_loss("joint_mse", use_target_weight=True)
        y = rng.rand(B, 64, 48, 17).astype(np.float32)
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    image = jnp.zeros((1, 256, 192, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), image, train=False)
    tx = create_optimizer(variables["params"], "adamw", learning_rate=1e-3,
                          weight_decay=0.05)
    state = create_train_state(variables, tx)
    step = build_train_step(nwl, tx, mesh=None, accum_steps=accum)
    x = jax.device_put(rng.rand(B, 256, 192, 3).astype(np.float32))
    y = jax.device_put(y)
    w = jax.device_put(np.ones((B, 17), np.float32))
    for _ in range(3):
        state, lv = step(state, x, y, w)
    _ = np.asarray(lv)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, lv = step(state, x, y, w)
    _ = np.asarray(lv)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1000, B / dt


if __name__ == "__main__":
    import json as _json

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,s2d",
                    help="hrnet backbone_setting variants")
    ap.add_argument("--backbone", default="hrnet_w32")
    ap.add_argument("--head", default="hrnet_head")
    ap.add_argument("--head-args", default="",
                    help='JSON, e.g. {"num_deconv_layers": 2, ...}')
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation microbatches per step")
    args = ap.parse_args()
    head_args = _json.loads(args.head_args) if args.head_args else {}
    cfgs = {
        "base": {},
        "s2d": {"stem_s2d": True},
        "bn4": {"bn_stats_frac": 0.25},
        "bn8": {"bn_stats_frac": 0.125},
        "s2d_bn4": {"stem_s2d": True, "bn_stats_frac": 0.25},
        "bnfused": {"bn_grad_stats": "fused"},
        "bnfrozen": {"bn_grad_stats": "frozen"},
        "b0s2d": {"branch0_s2d": True},
        "b0s2d_bnfused": {"branch0_s2d": True, "bn_grad_stats": "fused"},
    }
    for name in args.variants.split(","):
        backbone_args = cfgs[name] if args.backbone.startswith("hrnet") else {}
        ms, ips = bench(backbone_args, B=args.batch, backbone=args.backbone,
                        head=args.head, head_args=head_args, accum=args.accum)
        accum_note = f" (accum {args.accum})" if args.accum > 1 else ""
        print(f"{args.backbone}/{name:8s} {ms:7.2f} ms/step   "
              f"{ips:8.1f} img/s{accum_note}")

"""Device-vs-host AE grouping AP comparison across independently trained
checkpoints (round-4: one-checkpoint evidence -> multi-seed evidence).

Per seed: train HigherHRNet-W32 on synthetic multi-person COCO at
--image-size (256 default — the round-3 bottom-up benchmark protocol;
512 = the reference's recipe size,
/root/reference/configs/higher_hrnet/higher_hrnet_w32_ascend.yaml), then
evaluate the SAME checkpoint twice: host scipy-Hungarian grouping vs the
jittable fixed-capacity device matcher (ops/grouping.py, default on
accelerators). --hflip-tta / --multiscale / refine_missing pin the full
published eval recipe end-to-end. Reports per-seed AP pairs and the max
|delta|. Crash-safe: finished seeds append to <out>.runs.jsonl and are
skipped on resume.

    python tools/exp_grouping.py --seeds 0,1,2 --epochs 150 \
        --out docs/experiments/grouping_device_vs_host_r4.json
    python tools/exp_grouping.py --seeds 0 --image-size 512 --hflip-tta \
        --multiscale 1.0,2.0 --out docs/experiments/grouping_512_r5.json
"""
import argparse
import json
import logging
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

import numpy as np

from mindpose_tpu.utils.cache import enable_compilation_cache
from tools.common.log import setup_default_logging
from tools.make_synthetic_coco import generate_split

SETTING = {
    "image_size": [256, 256],
    "max_image_size": [256, 256],
    "heatmap_sizes": [[64, 64], [128, 128]],
    "sigma": 2.0,
    "expand_mask": True,
    "pixel_std": 200.0,
    "tag_per_joint": True,
    "flip_pairs": [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                   [13, 14], [15, 16]],
}
EVAL_SETTING = {
    "has_heatmap_output": True,
    "hflip_tta": False,
    "downsample_scale": 2,
    "vis_thr": 0.1,
    "oks_thr": 0.9,
    "tag_thr": 1.0,
    "joint_order": [0, 1, 2, 3, 4, 5, 6, 11, 12, 7, 8, 9, 10, 13, 14, 15, 16],
    "ignore_too_much": False,
    "use_rounded_norm": True,
    "use_nms": False,
    "soft_nms": False,
    "refine_missing_joint": True,
    "sigmas": [0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072,
               0.072, 0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089,
               0.089],
}
K, M = 17, 30


def apply_image_size(size: int) -> None:
    """Re-derive the size-coupled settings for a square --image-size."""
    SETTING["image_size"] = [size, size]
    SETTING["max_image_size"] = [size, size]
    SETTING["heatmap_sizes"] = [[size // 4, size // 4],
                                [size // 2, size // 2]]


def train_seed(seed: int, data, epochs: int, batch_size: int,
               steps_per_epoch: int):
    import jax
    import jax.numpy as jnp

    import mindpose_tpu as mp
    from mindpose_tpu.data import create_dataset, create_pipeline
    from mindpose_tpu.optim import create_optimizer
    from mindpose_tpu.parallel import build_train_step, create_train_state

    from mindpose_tpu.data.device_pipeline import (
        BOTTOMUP_DEVICE_FINAL_COLUMNS,
        build_bottomup_preprocess,
    )

    img_root, ann = data["train"]
    ds = create_dataset(img_root, ann, dataset_format="coco_bottomup",
                        is_train=True, config=SETTING)
    # device pipeline (round-3 design): the host stops after the cv2 warps +
    # AE tag indices; the multi-level Gaussian targets render inside the
    # jitted step (ops/target.py) — on this 1-core host the host-side
    # rasterizer alone is slower than the TPU step and starves it
    loader = create_pipeline(
        ds,
        [{"bottomup_random_affine": {"rot_factor": 20,
                                     "scale_factor": [0.8, 1.2]}},
         {"bottomup_horizontal_random_flip": {"flip_prob": 0.5}},
         {"bottomup_generate_tag_ind": {"sigma": 2.0, "max_num": M}}],
        method="bottomup", batch_size=batch_size, is_train=True,
        config=SETTING, seed=seed, num_workers=2, normalize=False,
        final_columns=BOTTOMUP_DEVICE_FINAL_COLUMNS,
    )
    preprocess = build_bottomup_preprocess(
        heatmap_sizes=SETTING["heatmap_sizes"],
        normalize_mean=[0.485, 0.456, 0.406],
        normalize_std=[0.229, 0.224, 0.225], sigma=2.0)
    net = mp.create_network(
        "hrnet_w32", "higher_hrnet_head", dtype=jnp.bfloat16,
        backbone_args={"branch0_s2d": True, "bn_grad_stats": "fused"},
        head_args={"with_ae_loss": (True, False)},
    )
    loss = mp.create_loss(
        "ae_multi_loss", num_joints=K, num_stages=2,
        stage_sizes=SETTING["heatmap_sizes"],
        mse_loss_factor=[1.0, 1.0], ae_loss_factor=[0.001, 0.001],
        with_mse_loss=[True, True], with_ae_loss=[True, False],
    )
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    h, w = SETTING["image_size"][1], SETTING["image_size"][0]
    variables = net.init(jax.random.PRNGKey(seed),
                         jnp.zeros((1, h, w, 3), jnp.float32),
                         train=False)
    tx = create_optimizer(variables["params"], "adam", learning_rate=1e-3)
    state = create_train_state(variables, tx)
    step_fn = build_train_step(nwl, tx, mesh=None, preprocess=preprocess)

    t0 = time.time()
    it = iter(loader)
    for ep in range(epochs):
        for _ in range(steps_per_epoch):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(loader)
                batch = next(it)
            state, lv = step_fn(state, batch["image"], batch["keypoints"],
                                batch["mask"], batch["tag_ind"])
        if (ep + 1) % 25 == 0:
            # ae_multi_loss returns stacked per-component losses
            logging.info("seed %d epoch %d loss %.5f (%.0fs)", seed, ep + 1,
                         float(np.asarray(lv).mean()), time.time() - t0)
    return net, state


def eval_grouping(net, state, data, device_grouping: bool,
                  hflip_tta: bool = False, multiscale=(1.0,),
                  eval_batch: int = 4) -> dict:
    import mindpose_tpu as mp
    from mindpose_tpu.data import create_dataset, create_pipeline
    from mindpose_tpu.engine import create_evaluator, create_inferencer

    img_root, ann = data["val"]
    vds = create_dataset(img_root, ann, dataset_format="coco_bottomup",
                         is_train=False, config=SETTING)
    vloader = create_pipeline(vds, ["bottomup_rescale", "bottomup_pad"],
                              method="bottomup", batch_size=eval_batch,
                              is_train=False, config=SETTING)
    decoder = mp.create_decoder(
        "bottomup_heatmap_ae", num_joints=K, num_stages=2,
        with_ae_loss=(True, False), use_nms=True, nms_kernel=3, max_num=M)
    eval_net = mp.create_eval_network(net, decoder, output_raw=True)
    cfg = {**EVAL_SETTING, "device_grouping": device_grouping,
           "hflip_tta": hflip_tta, "multiscale_tta": tuple(multiscale)}
    inferencer = create_inferencer(eval_net, name="bottomup_heatmap_ae",
                                   config=cfg, dataset_config=SETTING)
    with tempfile.TemporaryDirectory() as td:
        evaluator = create_evaluator(
            ann, name="bottomup", metric=["AP"], config=cfg,
            dataset_config=SETTING,
            result_path=os.path.join(td, "result.json"))
        records = inferencer(vloader, variables={
            "params": state.params, "batch_stats": state.batch_stats})
        return evaluator(records)


def main():
    setup_default_logging()
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--steps-per-epoch", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--train-images", type=int, default=160)
    p.add_argument("--val-images", type=int, default=120)
    p.add_argument("--people", type=int, default=4)
    p.add_argument("--image-size", type=int, default=256,
                   help="square train/eval input size (512 = the "
                        "reference's HigherHRNet recipe)")
    p.add_argument("--hflip-tta", action="store_true",
                   help="eval with horizontal-flip TTA (the published "
                        "bottom-up recipe)")
    p.add_argument("--multiscale", default="1.0",
                   help="comma-separated eval TTA scales, e.g. 1.0,2.0")
    p.add_argument("--eval-batch", type=int, default=4)
    p.add_argument("--data-root", default="")
    p.add_argument("--out", default="")
    args = p.parse_args()
    apply_image_size(args.image_size)
    scales = tuple(float(s) for s in args.multiscale.split(","))

    root = args.data_root or tempfile.mkdtemp(prefix="exp_grouping_")
    data = {}
    for split, n, seed in (("train", args.train_images, 0),
                           ("val", args.val_images, 1)):
        sroot = os.path.join(root, split)
        if not os.path.exists(os.path.join(sroot, "annotations.json")):
            generate_split(sroot, n, seed=seed, people_per_img=args.people)
        data[split] = (os.path.join(sroot, "images"),
                       os.path.join(sroot, "annotations.json"))

    runs = []
    runs_path = (args.out + ".runs.jsonl") if args.out else ""
    done = set()
    if runs_path and os.path.exists(runs_path):
        with open(runs_path) as f:
            for ln in f:
                try:
                    rec = json.loads(ln)
                    runs.append(rec)
                    done.add(rec["seed"])
                except (json.JSONDecodeError, KeyError, TypeError):
                    pass

    for seed in [int(s) for s in args.seeds.split(",")]:
        if seed in done:
            continue
        net, state = train_seed(seed, data, args.epochs, args.batch_size,
                                args.steps_per_epoch)
        host = eval_grouping(net, state, data, device_grouping=False,
                             hflip_tta=args.hflip_tta, multiscale=scales,
                             eval_batch=args.eval_batch)
        dev = eval_grouping(net, state, data, device_grouping=True,
                            hflip_tta=args.hflip_tta, multiscale=scales,
                            eval_batch=args.eval_batch)
        rec = {"seed": seed, "AP_host": float(host["AP"]),
               "AP_device": float(dev["AP"]),
               "delta": float(dev["AP"] - host["AP"])}
        runs.append(rec)
        print(json.dumps(rec), flush=True)
        if runs_path:
            with open(runs_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    deltas = [abs(r["delta"]) for r in runs]
    report = {
        "protocol": {
            "train_images": args.train_images, "val_images": args.val_images,
            "people_per_img": args.people, "epochs": args.epochs,
            "steps_per_epoch": args.steps_per_epoch,
            "batch_size": args.batch_size,
            "model": "higher_hrnet_w32 %dx%d heatmaps %d+%d" % (
                args.image_size, args.image_size,
                args.image_size // 4, args.image_size // 2),
            "hflip_tta": bool(args.hflip_tta),
            "multiscale_tta": list(scales),
            "refine_missing_joint": EVAL_SETTING["refine_missing_joint"],
        },
        "runs": runs,
        "max_abs_delta": max(deltas) if deltas else None,
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        logging.info("wrote %s", args.out)


if __name__ == "__main__":
    main()

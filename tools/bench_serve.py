"""Serving latency benchmark: TopDownPredictor end-to-end per-request time.

The training benches (bench.py, bench_variant.py) time the jitted step;
serving cares about something else — the wall-clock from (raw image +
person boxes) to keypoints, including the host-side crop geometry, the
device forward+decode, and the result fetch. This tool measures that for
any registered family preset across request sizes (boxes per image).

Over the axon tunnel every call pays a ~30 ms host<->device round trip
(docs/performance.md), which floors per-request latency; on a co-located
TPU host that term vanishes, so the amortized column (many requests in
flight, one fetch barrier at the end) is the better proxy for deployed
throughput while p50 bounds the tunnel-floored interactive latency.

Usage (serialize with any other chip user):
    python tools/bench_serve.py --models resnet50,hrnet_w32,vit_b,rle,simcc \
        --batch-sizes 1,8,32 --out docs/experiments/serving_r3.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

import jax
import numpy as np

from mindpose_tpu.utils.cache import enable_compilation_cache

DATASET_SETTING = {
    "image_size": [192, 256],
    "heatmap_size": [48, 64],
    "pixel_std": 200.0,
    "scale_padding": 1.25,
    "flip_pairs": [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                   [13, 14], [15, 16]],
    "upper_body_ids": list(range(11)),
}

# family presets: backbone, head (+args), decoder (+args)
PRESETS = {
    "resnet50": dict(backbone="resnet50", head="simple_baseline_head",
                     decoder="topdown_heatmap",
                     decoder_args={"shift_coordinate": True}),
    "hrnet_w32": dict(backbone="hrnet_w32", head="hrnet_head",
                      decoder="topdown_heatmap",
                      decoder_args={"shift_coordinate": True}),
    "vit_b": dict(backbone="vit_b", head="simple_baseline_head",
                  decoder="topdown_heatmap",
                  decoder_args={"shift_coordinate": True}),
    "simcc": dict(backbone="resnet50", head="simcc_head",
                  head_args={"input_size": [192, 256], "split_ratio": 2.0},
                  decoder="simcc",
                  decoder_args={"input_size": [192, 256],
                                "split_ratio": 2.0, "sigma": 6.0}),
    "rle": dict(backbone="resnet50", head="rle_head",
                decoder="regression",
                decoder_args={"input_size": [192, 256]}),
}


def build_predictor(preset: dict, batch_size: int, quantize: str = ""):
    import jax.numpy as jnp

    from mindpose_tpu.engine.predictor import TopDownPredictor
    from mindpose_tpu.models.model_factory import create_network

    net = create_network(
        backbone_name=preset["backbone"],
        head_name=preset["head"],
        num_joints=17,
        head_args=preset.get("head_args"),
        dtype=jnp.bfloat16,
    )
    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 256, 192, 3), jnp.float32), train=False)
    return TopDownPredictor(
        net, variables,
        dataset_setting=DATASET_SETTING,
        decoder_setting=preset.get("decoder_args"),
        decoder_name=preset["decoder"],
        batch_size=batch_size,
        quantize=quantize,
    )


def bench_model(name: str, batch_sizes, iters: int, image: np.ndarray,
                rng: np.random.RandomState, quantize: str = "") -> dict:
    out = {}
    for bs in batch_sizes:
        predictor = build_predictor(PRESETS[name], batch_size=bs,
                                    quantize=quantize)
        h, w = image.shape[:2]
        boxes = np.stack([
            np.array([rng.uniform(0, w / 2), rng.uniform(0, h / 2),
                      rng.uniform(80, w / 2), rng.uniform(120, h / 2)],
                     np.float32)
            for _ in range(bs)
        ])
        preds = predictor(image, boxes)  # warmup / compile
        assert preds.shape == (bs, 17, 3)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            predictor(image, boxes)
            times.append(time.perf_counter() - t0)
        ms = np.asarray(times) * 1000
        out[f"batch{bs}"] = {
            "p50_ms": round(float(np.percentile(ms, 50)), 2),
            "p90_ms": round(float(np.percentile(ms, 90)), 2),
            "p99_ms": round(float(np.percentile(ms, 99)), 2),
            "boxes_per_sec": round(bs / float(np.median(times)), 1),
        }
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", default="resnet50,hrnet_w32,vit_b,rle,simcc")
    p.add_argument("--batch-sizes", default="1,8,32")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--image-hw", default="480,640")
    p.add_argument("--quantize", default="",
                   help="weight quantization mode ('' or 'int8')")
    p.add_argument("--out", default="", help="write the JSON report here")
    args = p.parse_args()

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    h, w = (int(x) for x in args.image_hw.split(","))
    image = rng.randint(0, 255, (h, w, 3), np.uint8)
    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]

    report = {
        "backend": jax.default_backend(),
        "image_hw": [h, w],
        "iters": args.iters,
        "quantize": args.quantize,
        "note": "per-request wall clock incl. host crop geometry + device "
                "forward/decode + fetch; axon tunnel adds ~30 ms RTT per "
                "request in this environment",
        "models": {},
    }
    for name in args.models.split(","):
        name = name.strip()
        report["models"][name] = bench_model(
            name, batch_sizes, args.iters, image, rng,
            quantize=args.quantize)
        print(name, json.dumps(report["models"][name]))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()

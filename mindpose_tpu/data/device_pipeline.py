"""On-device input pipeline: move normalize + target encode into the step.

The reference renders Gaussian targets and normalizes images in CPU worker
processes (HOT LOOP #1, SURVEY.md §3.1). With this path the host workers stop
at the affine crop; raw uint8-range crops and post-affine keypoints ship to
the device, where normalization and the full [N, H, W, K] Gaussian
rasterization fuse into the jitted train step (ops/image.py, ops/target.py —
bit-parity with the host encode is covered by tests/data/test_device_ops.py).

Enable with ``device_pipeline: True`` in a top-down config.
"""
from typing import Any, Callable, Dict, List, Tuple

import jax.numpy as jnp

from ..ops.image import normalize_image
from ..ops.target import generate_topdown_targets

__all__ = [
    "DEVICE_FINAL_COLUMNS",
    "strip_host_target_transform",
    "build_topdown_preprocess",
]

DEVICE_FINAL_COLUMNS = ["image", "keypoints"]


def strip_host_target_transform(
    transforms: List[Any],
) -> Tuple[List[Any], Dict[str, Any]]:
    """Remove topdown_generate_target from the list; return its kwargs."""
    kept = []
    target_kwargs: Dict[str, Any] = {}
    for t in transforms:
        name = t if isinstance(t, str) else list(t.keys())[0]
        if name == "topdown_generate_target":
            if isinstance(t, dict):
                target_kwargs = dict(list(t.values())[0] or {})
            continue
        kept.append(t)
    return kept, target_kwargs


def build_topdown_preprocess(
    image_size,
    heatmap_size,
    normalize_mean,
    normalize_std,
    sigma: float = 2.0,
    use_udp: bool = False,
) -> Callable:
    """Preprocess closure for build_train_step: (image, keypoints) ->
    (normalized image, target, target_weight)."""
    mean = jnp.asarray(normalize_mean, jnp.float32)
    std = jnp.asarray(normalize_std, jnp.float32)
    hm = (int(heatmap_size[0]), int(heatmap_size[1]))
    im = (int(image_size[0]), int(image_size[1]))

    def preprocess(image, keypoints):
        image = normalize_image(image, mean, std)
        target, weight = generate_topdown_targets(
            keypoints, heatmap_size=hm, image_size=im, sigma=sigma,
            use_udp=use_udp,
        )
        return image, target, weight

    return preprocess

"""On-device input pipeline: move normalize + target encode into the step.

The reference renders Gaussian targets and normalizes images in CPU worker
processes (HOT LOOP #1, SURVEY.md §3.1). Two levels:

- ``device_pipeline: true`` — host workers stop at the affine crop; raw
  uint8-range crops and post-affine keypoints ship to the device, where
  normalization and the full [N, H, W, K] Gaussian rasterization fuse into
  the jitted train step (ops/image.py, ops/target.py — bit-parity with the
  host encode is covered by tests/data/test_device_ops.py).

- ``device_pipeline: full`` — host workers do NO pixel work beyond JPEG
  decode: the affine (and any deferred hflip) is emitted as a 2x3 matrix
  (topdown_affine_matrix transform), whole uint8 frames ship zero-padded to
  size buckets (loader ``image_bucket``), and warp + normalize + encode all
  fuse into the step (ops/image.affine_warp). Replaces the reference's cv2
  worker pool entirely (topdown_transform.py:217,248).
"""
from typing import Any, Callable, Dict, List, Tuple

import jax.numpy as jnp

from ..ops.image import affine_warp, normalize_image
from ..ops.target import (
    generate_regression_targets,
    generate_simcc_targets,
    generate_topdown_targets,
)

__all__ = [
    "DEVICE_FINAL_COLUMNS",
    "DEVICE_FULL_FINAL_COLUMNS",
    "BOTTOMUP_DEVICE_FINAL_COLUMNS",
    "strip_host_target_transform",
    "to_matrix_transforms",
    "build_topdown_preprocess",
    "build_topdown_full_preprocess",
    "build_bottomup_preprocess",
]

DEVICE_FINAL_COLUMNS = ["image", "keypoints"]
DEVICE_FULL_FINAL_COLUMNS = ["image", "warp_mat", "keypoints"]


def strip_host_target_transform(
    transforms: List[Any],
) -> Tuple[List[Any], Dict[str, Any]]:
    """Remove the host target-encode transform from the list.

    Returns its kwargs; for the SimCC / regression variants a
    ``target_type`` marker is added so build_topdown_preprocess renders bin
    labels / normalized coordinates instead of heatmaps.
    """
    kept = []
    target_kwargs: Dict[str, Any] = {}
    for t in transforms:
        name = t if isinstance(t, str) else list(t.keys())[0]
        if name == "topdown_generate_target":
            if isinstance(t, dict):
                target_kwargs = dict(list(t.values())[0] or {})
            continue
        if name == "topdown_generate_simcc_target":
            if isinstance(t, dict):
                target_kwargs = dict(list(t.values())[0] or {})
            target_kwargs["target_type"] = "simcc"
            continue
        if name == "topdown_generate_regression_target":
            if isinstance(t, dict):
                target_kwargs = dict(list(t.values())[0] or {})
            target_kwargs["target_type"] = "regression"
            continue
        kept.append(t)
    return kept, target_kwargs


def _make_target_encoder(
    image_size, heatmap_size, sigma, use_udp, target_type, split_ratio
) -> Callable:
    """The single target-type dispatch (heatmap / simcc / regression) shared
    by the encode-mode and full-mode preprocess builders: keypoints ->
    (target, target_weight), jit-traceable."""
    hm = (int(heatmap_size[0]), int(heatmap_size[1]))
    im = (int(image_size[0]), int(image_size[1]))

    def encode(keypoints):
        if target_type == "simcc":
            return generate_simcc_targets(
                keypoints, input_size=im, split_ratio=split_ratio,
                sigma=sigma,
            )
        if target_type == "regression":
            return generate_regression_targets(keypoints, input_size=im)
        return generate_topdown_targets(
            keypoints, heatmap_size=hm, image_size=im, sigma=sigma,
            use_udp=use_udp,
        )

    return encode


def build_topdown_preprocess(
    image_size,
    heatmap_size,
    normalize_mean,
    normalize_std,
    sigma: float = 2.0,
    use_udp: bool = False,
    target_type: str = "heatmap",
    split_ratio: float = 2.0,
) -> Callable:
    """Preprocess closure for build_train_step: (image, keypoints) ->
    (normalized image, target, target_weight).

    ``target_type="simcc"`` renders per-axis bin labels
    (ops/target.py:generate_simcc_targets) instead of Gaussian heatmaps.
    """
    mean = jnp.asarray(normalize_mean, jnp.float32)
    std = jnp.asarray(normalize_std, jnp.float32)
    encode = _make_target_encoder(image_size, heatmap_size, sigma, use_udp,
                                  target_type, split_ratio)

    def preprocess(image, keypoints):
        image = normalize_image(image, mean, std)
        target, weight = encode(keypoints)
        return image, target, weight

    return preprocess


def to_matrix_transforms(transforms: List[Any]) -> List[Any]:
    """Rewrite a host top-down transform list for the full device pipeline:
    topdown_affine -> topdown_affine_matrix (same kwargs) and the horizontal
    flip defers its mirror into the warp matrix. Geometry-only transforms
    (box_to_center_scale, halfbody, scale_rotation) pass through unchanged.
    """
    out: List[Any] = []
    for t in transforms:
        name = t if isinstance(t, str) else next(iter(t))
        kwargs = dict() if isinstance(t, str) else dict(next(iter(t.values())) or {})
        if name == "topdown_affine":
            out.append({"topdown_affine_matrix": kwargs})
        elif name == "topdown_horizontal_random_flip":
            kwargs["defer_to_warp"] = True
            out.append({"topdown_horizontal_random_flip": kwargs})
        else:
            out.append(t)
    return out


def build_topdown_full_preprocess(
    image_size,
    heatmap_size,
    normalize_mean,
    normalize_std,
    sigma: float = 2.0,
    use_udp: bool = False,
    target_type: str = "heatmap",
    split_ratio: float = 2.0,
) -> Callable:
    """Preprocess closure for build_train_step in ``device_pipeline: full``
    mode: (padded uint8 frames, warp matrices, post-affine keypoints) ->
    (warped normalized crops, target, target_weight). The warp, normalize
    and target encode (heatmap / simcc / regression, same dispatch as
    build_topdown_preprocess) all fuse into the jitted step."""
    mean = jnp.asarray(normalize_mean, jnp.float32)
    std = jnp.asarray(normalize_std, jnp.float32)
    out_hw = (int(image_size[1]), int(image_size[0]))  # (H, W)
    encode = _make_target_encoder(image_size, heatmap_size, sigma, use_udp,
                                  target_type, split_ratio)

    def preprocess(frames, warp_mats, keypoints):
        crops = affine_warp(frames, warp_mats, out_hw)
        crops = normalize_image(crops, mean, std)
        target, weight = encode(keypoints)
        return crops, target, weight

    return preprocess


BOTTOMUP_DEVICE_FINAL_COLUMNS = ["image", "keypoints", "mask", "tag_ind"]


def build_bottomup_preprocess(
    heatmap_sizes,
    normalize_mean,
    normalize_std,
    sigma: float = 2.0,
) -> Callable:
    """Preprocess closure for build_train_step in the bottom-up device
    pipeline: (uint8 image, per-level keypoints, uint8 mask, tag_ind) ->
    (normalized image, multi-level targets, mask, tag_ind).

    The host stops after warping image/mask/keypoints (cv2) and computing AE
    tag indices; the multi-level Gaussian rasterization — by far the largest
    train-batch tensor ([S, Hmax, Wmax, K] float32, ~9 MB/record at 512
    input) — renders on device from the [S, max_num, K, 3] keypoints
    (~12 KB/record) via ops/target.generate_bottomup_targets.
    """
    from ..ops.target import generate_bottomup_targets

    mean = jnp.asarray(normalize_mean, jnp.float32)
    std = jnp.asarray(normalize_std, jnp.float32)
    sizes = [(int(w), int(h)) for w, h in heatmap_sizes]
    hmax = max(h for _, h in sizes)
    wmax = max(w for w, _ in sizes)

    def preprocess(image, keypoints, mask, tag_ind):
        image = normalize_image(image, mean, std)
        mask = mask.astype(jnp.float32)
        levels = []
        for s, (w, h) in enumerate(sizes):
            t = generate_bottomup_targets(
                keypoints[:, s], heatmap_size=(w, h), sigma=sigma)
            levels.append(jnp.pad(
                t, ((0, 0), (0, hmax - h), (0, wmax - w), (0, 0))))
        target = jnp.stack(levels, axis=1)  # [N, S, Hmax, Wmax, K]
        return image, target, mask, tag_ind

    return preprocess

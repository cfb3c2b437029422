"""Top-down (single-instance crop) transforms.

Parity: /root/reference/mindpose/data/transform/topdown_transform.py — the
same geometry (pixel_std=200 center/scale convention, UDP warp, standard
round-to-pixel vs UDP sub-pixel Gaussian encode), with the heatmap target
emitted in HWK layout to match the framework's NHWC device tensors.
"""
from typing import Any, Dict, Optional, Tuple

import cv2
import numpy as np

from ...register import register
from .transform import Transform
from .utils import (
    affine_transform,
    compose_affine,
    fliplr_joints,
    flip_index_from_pairs,
    get_affine_transform,
    get_warp_matrix,
    hflip_matrix,
    warp_affine_joints,
)

__all__ = [
    "TopDownTransform",
    "TopDownBoxToCenterScale",
    "TopDownAffine",
    "TopDownAffineMatrix",
    "TopDownGenerateTarget",
    "TopDownHorizontalRandomFlip",
    "TopDownHalfBodyTransform",
    "TopDownRandomScaleRotation",
    "TopDownPhotometricDistortion",
]

cv2.setNumThreads(2)


class TopDownTransform(Transform):
    def load_transform_cfg(self) -> Dict[str, Any]:
        cfg = dict()
        cfg["image_size"] = np.array(self.config["image_size"])
        cfg["heatmap_size"] = np.array(self.config["heatmap_size"])
        assert len(cfg["image_size"]) == 2
        assert len(cfg["heatmap_size"]) == 2

        flip_pairs = np.array(self.config["flip_pairs"])
        cfg["flip_pairs"] = flip_pairs
        cfg["flip_index"] = flip_index_from_pairs(flip_pairs)
        cfg["upper_body_ids"] = np.array(self.config["upper_body_ids"])
        cfg["pixel_std"] = float(self.config["pixel_std"])
        cfg["scale_padding"] = float(self.config["scale_padding"])
        cfg["joint_weights"] = (
            np.array(self.config["joint_weights"])
            if "joint_weights" in self.config
            else None
        )
        return cfg


@register("transform", extra_name="topdown_box_to_center_scale")
class TopDownBoxToCenterScale(TopDownTransform):
    """xywh box -> (center, scale); random center jitter (p=0.3) on train."""

    def transform(self, state: Dict[str, Any]) -> Dict[str, Any]:
        center, scale = self._xywh2cs(*state["boxes"])
        return dict(center=center, scale=scale)

    def _xywh2cs(self, x, y, w, h) -> Tuple[np.ndarray, np.ndarray]:
        image_size = self._transform_cfg["image_size"]
        aspect_ratio = image_size[0] / image_size[1]
        center = np.array([x + w * 0.5, y + h * 0.5], dtype=np.float32)

        if self.is_train and np.random.rand() < 0.3:
            center += np.random.uniform(-0.2, 0.2, size=2) * [w, h]

        if w > aspect_ratio * h:
            h = w * 1.0 / aspect_ratio
        elif w < aspect_ratio * h:
            w = h * aspect_ratio

        pixel_std = self._transform_cfg["pixel_std"]
        scale = np.array([w / pixel_std, h / pixel_std], dtype=np.float32)
        scale = scale * self._transform_cfg["scale_padding"]
        return center, scale


@register("transform", extra_name="topdown_affine")
class TopDownAffine(TopDownTransform):
    """Crop/warp the instance to image_size; standard or UDP matrix."""

    def __init__(
        self,
        is_train: bool = True,
        config: Optional[Dict[str, Any]] = None,
        use_udp: bool = False,
    ) -> None:
        super().__init__(is_train=is_train, config=config)
        self.use_udp = use_udp

    def _matrix_and_keypoints(self, state: Dict[str, Any]) -> Dict[str, Any]:
        """Shared core: build the (UDP or standard) warp matrix and map the
        keypoints through it; pixel warping is left to the caller."""
        image_size = self._transform_cfg["image_size"]
        pixel_std = self._transform_cfg["pixel_std"]
        rotation = state.get("rotation", 0.0)

        if self.use_udp:
            trans = get_warp_matrix(
                rotation,
                state["center"] * 2.0,
                image_size - 1.0,
                state["scale"] * pixel_std,
            )
        else:
            trans = get_affine_transform(
                state["center"],
                state["scale"],
                rotation,
                image_size,
                pixel_std=pixel_std,
            )

        out: Dict[str, Any] = dict(_trans=trans)
        if "keypoints" in state:
            keypoints = state["keypoints"].copy()
            if self.use_udp:
                keypoints[:, 0:2] = warp_affine_joints(keypoints[:, 0:2], trans)
            else:
                for i in range(keypoints.shape[0]):
                    if keypoints[i, 2] > 0.0:
                        keypoints[i, 0:2] = affine_transform(keypoints[i, 0:2], trans)
            out["keypoints"] = keypoints
        return out

    def transform(self, state: Dict[str, Any]) -> Dict[str, Any]:
        image_size = self._transform_cfg["image_size"]
        out = self._matrix_and_keypoints(state)
        trans = out.pop("_trans")
        out["image"] = cv2.warpAffine(
            state["image"],
            np.asarray(trans, dtype=np.float64),
            (int(image_size[0]), int(image_size[1])),
            flags=cv2.INTER_LINEAR,
        )
        return out


@register("transform", extra_name="topdown_affine_matrix")
class TopDownAffineMatrix(TopDownAffine):
    """Device-pipeline variant of TopDownAffine: compute the warp matrix and
    map the keypoints, but leave the pixels to the on-device warp
    (ops/image.affine_warp). A deferred horizontal flip (state["hflip"]) is
    folded into the matrix so the host never touches pixel data.

    ``crop_source_patch`` (default on) ships only the axis-aligned source
    rectangle the output crop actually samples — the preimage AABB of the
    output corners under the warp, plus a bilinear margin — instead of the
    whole frame, with the matrix rebased to patch coordinates. The device
    result is equal up to f32 coordinate rounding (exact in exact
    arithmetic: every sampled source pixel is inside the patch and
    out-of-frame stays zero in both; the rebased translation reassociates
    the f32 sample-coordinate sum, observed <=0.004 on a 0-255 scale —
    tests/data/test_crop_source_patch.py), while host->device bytes drop
    from full padded frames (~126 MB/batch at VGA, batch 128) to roughly
    the person-crop footprint. Host cost is one numpy slice per record —
    full mode keeps its minimal-host-CPU property.
    """

    def __init__(
        self,
        is_train: bool = True,
        config: Optional[Dict[str, Any]] = None,
        use_udp: bool = False,
        crop_source_patch: bool = True,
        patch_margin: int = 2,
    ) -> None:
        super().__init__(is_train=is_train, config=config, use_udp=use_udp)
        self.crop_source_patch = crop_source_patch
        self.patch_margin = int(patch_margin)

    def transform(self, state: Dict[str, Any]) -> Dict[str, Any]:
        out = self._matrix_and_keypoints(state)
        trans = out.pop("_trans")

        if state.get("hflip", False):
            # keypoints/center are already in flipped coordinates; the warp
            # must first mirror the original frame
            trans = compose_affine(trans, hflip_matrix(state["image"].shape[1]))
        if self.crop_source_patch:
            patch, trans = self._crop_to_patch(state["image"], trans)
            out["image"] = patch
        out["warp_mat"] = np.asarray(trans, np.float32)
        return out

    def _crop_to_patch(
        self, frame: np.ndarray, trans: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Crop the frame to the warp's source AABB; rebase the matrix.

        The output rectangle's preimage under an affine map is a convex
        quad; its AABB (with a bilinear-support margin, clamped to the
        frame) contains every source pixel the device warp can touch, so
        warping the patch with the rebased matrix reproduces the full-frame
        warp exactly.
        """
        h, w = frame.shape[:2]
        ow, oh = (int(x) for x in self._transform_cfg["image_size"])
        m = np.vstack([np.asarray(trans, np.float64), [0.0, 0.0, 1.0]])
        corners = np.array(
            [[0, 0, 1], [ow - 1, 0, 1], [0, oh - 1, 1], [ow - 1, oh - 1, 1]],
            np.float64,
        ).T
        src = np.linalg.inv(m) @ corners  # [3, 4] source coords
        mg = self.patch_margin
        x0 = max(0, int(np.floor(src[0].min())) - mg)
        y0 = max(0, int(np.floor(src[1].min())) - mg)
        x1 = min(w, int(np.ceil(src[0].max())) + mg + 1)
        y1 = min(h, int(np.ceil(src[1].max())) + mg + 1)
        # fully out-of-frame boxes degenerate to a 1px patch (sampled region
        # is out of frame either way -> zeros, matching cv2 border behavior)
        x0 = min(x0, w - 1)
        y0 = min(y0, h - 1)
        x1 = max(x1, x0 + 1)
        y1 = max(y1, y0 + 1)
        patch = np.ascontiguousarray(frame[y0:y1, x0:x1])
        # patch coords q correspond to source s = q + (x0, y0):
        # trans'(q) = A q + (A @ offset + b)
        a = np.asarray(trans, np.float64)[:, :2]
        b = np.asarray(trans, np.float64)[:, 2]
        b2 = a @ np.array([x0, y0], np.float64) + b
        return patch, np.concatenate([a, b2[:, None]], axis=1)


@register("transform", extra_name="topdown_generate_target")
class TopDownGenerateTarget(TopDownTransform):
    """Rasterize per-joint Gaussian heatmaps (HWK layout) + target weights.

    ``use_udp`` switches from round-to-pixel centers with a shared kernel to
    the UDP unbiased sub-pixel-centered kernel (ref :377-430).
    """

    def __init__(
        self,
        is_train: bool = True,
        config: Optional[Dict[str, Any]] = None,
        sigma: float = 2.0,
        use_different_joint_weights: bool = False,
        use_udp: bool = False,
    ) -> None:
        super().__init__(is_train=is_train, config=config)
        self.sigma = sigma
        self.use_different_joint_weights = use_different_joint_weights
        self.use_udp = use_udp
        if use_different_joint_weights and self._transform_cfg["joint_weights"] is None:
            raise ValueError(
                "`joint_weights` must be provided if "
                "`use_different_joint_weights` is True."
            )

    def transform(self, state: Dict[str, Any]) -> Dict[str, Any]:
        image_size = self._transform_cfg["image_size"]
        w, h = self._transform_cfg["heatmap_size"]
        keypoints = state["keypoints"]
        num_joints = keypoints.shape[0]

        target_weight = np.zeros(num_joints, dtype=np.float32)
        target = np.zeros((num_joints, h, w), dtype=np.float32)

        tmp_size = self.sigma * 3
        # float size semantics: the kernel grid has ceil(size) samples and
        # its peak sits at the float floor-half — for fractional sigma the
        # patch is one sample longer than int(size) would give
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, None]
        x0 = y0 = size // 2
        if not self.use_udp:
            g_shared = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * self.sigma**2))

        for j in range(num_joints):
            target_weight[j] = keypoints[j, 2]

            if self.use_udp:
                feat_stride = (image_size - 1.0) / (np.array([w, h]) - 1.0)
                mu_x = int(keypoints[j][0] / feat_stride[0] + 0.5)
                mu_y = int(keypoints[j][1] / feat_stride[1] + 0.5)
            else:
                feat_stride = image_size / np.array([w, h])
                mu_x = round(keypoints[j][0] / feat_stride[0])
                mu_y = round(keypoints[j][1] / feat_stride[1])

            ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
            br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
            if ul[0] >= w or ul[1] >= h or br[0] < 0 or br[1] < 0:
                target_weight[j] = 0
                continue

            if target_weight[j] > 0.5:
                if self.use_udp:
                    mu_x_ac = keypoints[j][0] / feat_stride[0]
                    mu_y_ac = keypoints[j][1] / feat_stride[1]
                    x0_p = x0 + mu_x_ac - mu_x
                    y0_p = y0 + mu_y_ac - mu_y
                    g = np.exp(
                        -((x - x0_p) ** 2 + (y - y0_p) ** 2) / (2 * self.sigma**2)
                    )
                else:
                    g = g_shared

                g_x = max(0, -ul[0]), min(br[0], w) - ul[0]
                g_y = max(0, -ul[1]), min(br[1], h) - ul[1]
                img_x = max(0, ul[0]), min(br[0], w)
                img_y = max(0, ul[1]), min(br[1], h)
                target[j][img_y[0] : img_y[1], img_x[0] : img_x[1]] = g[
                    g_y[0] : g_y[1], g_x[0] : g_x[1]
                ]

        if self.use_different_joint_weights:
            target_weight = target_weight * self._transform_cfg["joint_weights"]

        # KHW -> HWK: targets feed NHWC device tensors
        return dict(
            target=np.ascontiguousarray(target.transpose(1, 2, 0)),
            target_weight=target_weight,
        )


@register("transform", extra_name="topdown_horizontal_random_flip")
class TopDownHorizontalRandomFlip(TopDownTransform):
    def __init__(
        self,
        is_train: bool = True,
        config: Optional[Dict[str, Any]] = None,
        flip_prob: float = 0.5,
        defer_to_warp: bool = False,
    ) -> None:
        super().__init__(is_train=is_train, config=config)
        self.flip_prob = flip_prob
        # device pipeline: keep pixels untouched, flag the flip so
        # TopDownAffineMatrix folds the mirror into the warp matrix
        self.defer_to_warp = defer_to_warp

    def transform(self, state: Dict[str, Any]) -> Dict[str, Any]:
        image = state["image"]
        keypoints = state["keypoints"]
        center = state["center"]

        if np.random.rand() <= self.flip_prob:
            if not self.defer_to_warp:
                image = cv2.flip(image, 1)
            flip_index = self._transform_cfg["flip_index"]
            if len(flip_index) != keypoints.shape[-2]:
                # trailing unpaired joints (cfg index inferred K = max+1)
                flip_index = flip_index_from_pairs(
                    self._transform_cfg["flip_pairs"], keypoints.shape[-2]
                )
            keypoints = fliplr_joints(
                keypoints, image.shape[1], flip_index=flip_index
            )
            center = center.copy()
            center[0] = image.shape[1] - center[0]
            if self.defer_to_warp:
                return dict(keypoints=keypoints, center=center, hflip=True)
        return dict(image=image, keypoints=keypoints, center=center)


@register("transform", extra_name="topdown_halfbody_transform")
class TopDownHalfBodyTransform(TopDownTransform):
    """Randomly crop to upper/lower body when enough joints are visible."""

    def __init__(
        self,
        is_train: bool = True,
        config: Optional[Dict[str, Any]] = None,
        num_joints_half_body: int = 8,
        prob_half_body: float = 0.3,
        scale_padding: float = 1.5,
    ) -> None:
        super().__init__(is_train=is_train, config=config)
        self.num_joints_half_body = num_joints_half_body
        self.prob_half_body = prob_half_body
        self.scale_padding = scale_padding

    def half_body_transform(self, keypoints: np.ndarray, num_joints: int = 17):
        upper, lower = [], []
        upper_ids = set(self._transform_cfg["upper_body_ids"].tolist())
        for j in range(num_joints):
            if keypoints[j][2] > 0:
                (upper if j in upper_ids else lower).append(keypoints[j])

        if np.random.randn() < 0.5 and len(upper) > 2:
            selected = upper
        elif len(lower) > 2:
            selected = lower
        else:
            selected = upper
        if len(selected) < 2:
            return None, None

        selected = np.array(selected, dtype=np.float32)
        center = selected.mean(axis=0)[:2]
        left_top = np.amin(selected, axis=0)
        right_bottom = np.amax(selected, axis=0)
        w = right_bottom[0] - left_top[0]
        h = right_bottom[1] - left_top[1]

        image_size = self._transform_cfg["image_size"]
        aspect_ratio = image_size[0] / image_size[1]
        if w > aspect_ratio * h:
            h = w * 1.0 / aspect_ratio
        elif w < aspect_ratio * h:
            w = h * aspect_ratio

        pixel_std = self._transform_cfg["pixel_std"]
        scale = np.array([w / pixel_std, h / pixel_std], dtype=np.float32)
        return center, scale * self.scale_padding

    def transform(self, state: Dict[str, Any]) -> Dict[str, Any]:
        keypoints = state["keypoints"]
        if (
            np.sum(keypoints[:, 2]) > self.num_joints_half_body
            and np.random.rand() < self.prob_half_body
        ):
            center, scale = self.half_body_transform(
                keypoints, num_joints=keypoints.shape[0]
            )
            if center is not None and scale is not None:
                return dict(center=center, scale=scale)
        return dict()


@register("transform", extra_name="topdown_randomscale_rotation")
class TopDownRandomScaleRotation(TopDownTransform):
    def __init__(
        self,
        is_train: bool = True,
        config: Optional[Dict[str, Any]] = None,
        rot_factor: float = 40.0,
        scale_factor: float = 0.5,
        rot_prob: float = 0.6,
    ) -> None:
        super().__init__(is_train=is_train, config=config)
        self.rot_factor = rot_factor
        self.scale_factor = scale_factor
        self.rot_prob = rot_prob

    def transform(self, state: Dict[str, Any]) -> Dict[str, Any]:
        s = state["scale"]
        sf = self.scale_factor
        rf = self.rot_factor

        s_factor = np.clip(np.random.randn() * sf + 1, 1 - sf, 1 + sf)
        s = s * np.float32(s_factor)
        r_factor = np.clip(np.random.randn() * rf, -rf * 2, rf * 2)
        r = np.float32(r_factor) if np.random.rand() <= self.rot_prob else np.float32(0.0)
        return dict(scale=s, rotation=r)


@register("transform", extra_name="topdown_generate_simcc_target")
class TopDownGenerateSimCCTarget(TopDownTransform):
    """Per-axis discrete Gaussian label distributions over SimCC bins.

    Beyond the reference: pairs with models/heads/simcc_head.py
    (arXiv:2107.03332). For each visible joint at input-image coords (x, y),
    the labels are Gaussians centered at x*split_ratio / y*split_ratio over
    the bin axes, each normalized to sum 1 (proper distributions for the
    KL loss). Emits ``target`` [K, Bx+By] (x labels then y labels) and
    ``target_weight`` [K]; joints whose peak falls outside the bin range
    get weight 0, mirroring the heatmap encoder's out-of-window rule.
    """

    def __init__(
        self,
        is_train: bool = True,
        config: Optional[Dict[str, Any]] = None,
        sigma: float = 6.0,
        split_ratio: float = 2.0,
    ) -> None:
        super().__init__(is_train=is_train, config=config)
        self.sigma = sigma
        self.split_ratio = split_ratio

    def transform(self, state: Dict[str, Any]) -> Dict[str, Any]:
        image_size = self._transform_cfg["image_size"]
        bx = int(round(float(image_size[0]) * self.split_ratio))
        by = int(round(float(image_size[1]) * self.split_ratio))
        keypoints = state["keypoints"]
        num_joints = keypoints.shape[0]

        mu = keypoints[:, :2].astype(np.float32) * self.split_ratio  # [K, 2]
        vis = keypoints[:, 2] > 0
        inside = (
            (mu[:, 0] >= 0) & (mu[:, 0] < bx)
            & (mu[:, 1] >= 0) & (mu[:, 1] < by)
        )
        target_weight = (vis & inside).astype(np.float32)

        def labels(centers, n_bins):
            grid = np.arange(n_bins, dtype=np.float32)[None, :]
            g = np.exp(
                -((grid - centers[:, None]) ** 2) / (2.0 * self.sigma**2)
            )
            s = g.sum(axis=1, keepdims=True)
            return g / np.maximum(s, 1e-12)

        target = np.zeros((num_joints, bx + by), dtype=np.float32)
        target[:, :bx] = labels(mu[:, 0], bx)
        target[:, bx:] = labels(mu[:, 1], by)
        target *= target_weight[:, None]
        return dict(target=target, target_weight=target_weight)

@register("transform", extra_name="topdown_generate_regression_target")
class TopDownGenerateRegressionTarget(TopDownTransform):
    """Normalized-coordinate targets for direct regression heads.

    Beyond the reference: pairs with models/heads/rle_head.py
    (arXiv:2107.11291). For each joint at input-image coords (x, y), the
    target is ``(x / W, y / H)`` — the shared convention of the rle loss
    and the regression decoder. Emits ``target`` [K, 2] and
    ``target_weight`` [K]; joints outside the crop (or invisible) get
    weight 0, mirroring the heatmap encoder's out-of-window rule.
    """

    def __init__(
        self,
        is_train: bool = True,
        config: Optional[Dict[str, Any]] = None,
    ) -> None:
        super().__init__(is_train=is_train, config=config)

    def transform(self, state: Dict[str, Any]) -> Dict[str, Any]:
        image_size = self._transform_cfg["image_size"]
        w, h = float(image_size[0]), float(image_size[1])
        keypoints = state["keypoints"]

        xy = keypoints[:, :2].astype(np.float32)
        vis = keypoints[:, 2] > 0
        inside = (
            (xy[:, 0] >= 0) & (xy[:, 0] < w)
            & (xy[:, 1] >= 0) & (xy[:, 1] < h)
        )
        target_weight = (vis & inside).astype(np.float32)
        target = xy / np.array([w, h], dtype=np.float32)
        target *= target_weight[:, None]
        return dict(target=target, target_weight=target_weight)


@register("transform", extra_name="topdown_photometric_distortion")
class TopDownPhotometricDistortion(TopDownTransform):
    """Random brightness / contrast / saturation / hue jitter (uint8 HWC).

    Beyond the reference (its augmentation is geometric only): the standard
    SSD-style photometric pipeline, each op applied with probability 0.5,
    contrast randomly ordered before or after saturation/hue. Pixels stay
    uint8; keypoints/geometry untouched, so it composes anywhere before
    ``topdown_affine`` (host path) and with the device pipeline (the warp
    consumes whatever pixels the host hands it).
    """

    def __init__(
        self,
        is_train: bool = True,
        config: Optional[Dict[str, Any]] = None,
        brightness_delta: float = 32.0,
        contrast_range: Tuple[float, float] = (0.5, 1.5),
        saturation_range: Tuple[float, float] = (0.5, 1.5),
        hue_delta: float = 18.0,
    ) -> None:
        super().__init__(is_train=is_train, config=config)
        self.brightness_delta = float(brightness_delta)
        self.contrast_range = tuple(contrast_range)
        self.saturation_range = tuple(saturation_range)
        self.hue_delta = float(hue_delta)

    @staticmethod
    def _clip_u8(image: np.ndarray) -> np.ndarray:
        return np.clip(image, 0, 255).astype(np.uint8)

    def _contrast(self, image: np.ndarray) -> np.ndarray:
        if np.random.rand() < 0.5:
            alpha = np.random.uniform(*self.contrast_range)
            image = self._clip_u8(image.astype(np.float32) * alpha)
        return image

    def transform(self, state: Dict[str, Any]) -> Dict[str, Any]:
        image = state["image"]

        if np.random.rand() < 0.5:
            delta = np.random.uniform(-self.brightness_delta,
                                      self.brightness_delta)
            image = self._clip_u8(image.astype(np.float32) + delta)

        contrast_first = np.random.rand() < 0.5
        if contrast_first:
            image = self._contrast(image)

        do_sat = np.random.rand() < 0.5
        do_hue = np.random.rand() < 0.5
        if do_sat or do_hue:
            hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.float32)
            if do_sat:
                hsv[..., 1] *= np.random.uniform(*self.saturation_range)
            if do_hue:
                # OpenCV uint8 hue wraps at 180
                hsv[..., 0] = (
                    hsv[..., 0] + np.random.uniform(-self.hue_delta,
                                                    self.hue_delta)
                ) % 180.0
            hsv[..., 1:] = np.clip(hsv[..., 1:], 0, 255)
            image = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)

        if not contrast_first:
            image = self._contrast(image)

        return dict(image=image)


"""Bottom-up AE inferencer: device decode -> host tag grouping.

Parity: /root/reference/mindpose/engine/inferencer/bottomup_inferencer.py:19-297.
The forward + multi-resolution decode (+TTA heatmap averaging with both tag
sets kept) is one jitted function; ``match_by_tag`` grouping, optional
missing-joint refinement and coordinate rescaling run on host per image.
"""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...data.transform.utils import (
    flip_index_from_pairs,
    transform_keypoints,
)
from ...register import register
from ...utils.match import match_by_tag
from .inferencer import Inferencer


@register("inferencer", extra_name="bottomup_heatmap_ae")
class BottomUpHeatMapAEInferencer(Inferencer):
    def __init__(self, net, variables=None, config=None, progress_bar=False,
                 decoder=None, mesh=None):
        super().__init__(net, variables=variables, config=config, mesh=mesh)
        self.progress_bar = progress_bar
        self.decoder = decoder if decoder is not None else net.decoder
        if not self._inference_cfg["has_heatmap_output"] and (
            self._inference_cfg["hflip_tta"]
            or len(self._inference_cfg["multiscale_tta"]) > 1
        ):
            raise ValueError("flip/multi-scale TTA needs heatmap output.")
        self._jit_forward = None

    def load_inference_cfg(self) -> Dict[str, Any]:
        cfg = dict()
        cfg["has_heatmap_output"] = self.config["has_heatmap_output"]
        cfg["hflip_tta"] = self.config["hflip_tta"]
        cfg["joint_order"] = self.config["joint_order"]
        cfg["vis_thr"] = float(self.config["vis_thr"])
        cfg["ignore_too_much"] = self.config["ignore_too_much"]
        cfg["use_rounded_norm"] = self.config["use_rounded_norm"]
        cfg["tag_thr"] = float(self.config["tag_thr"])
        cfg["pixel_std"] = float(self.config["pixel_std"])
        cfg["downsample_scale"] = self.config["downsample_scale"]
        cfg["refine_missing_joint"] = self.config["refine_missing_joint"]
        # tag grouping: on-device by default on accelerators (jittable
        # fixed-capacity matcher, ops/grouping.py — the reference algorithm
        # with a deterministic unrounded-distance tie-break, fuzz-proven
        # against the live reference in tests/parity_oracle/ and within
        # 0.001 AP on trained checkpoints); host scipy Hungarian on CPU,
        # where per-image dispatch beats jit. Override with
        # `device_grouping` in the eval config.
        default_device_grouping = jax.default_backend() != "cpu"
        cfg["device_grouping"] = self.config.get(
            "device_grouping", default_device_grouping
        )
        # multi-scale TTA (beyond ref; the HigherHRNet paper's eval recipe):
        # forward at each factor, average heatmaps at the scale-1 resolution,
        # group with the scale-1 tag sets only
        scales = tuple(
            dict.fromkeys(float(s) for s in self.config.get("multiscale_tta", (1.0,)))
        )
        if 1.0 not in scales:
            raise ValueError("multiscale_tta must include scale 1.0")
        cfg["multiscale_tta"] = scales
        cfg["flip_pairs"] = np.array(self.config["flip_pairs"])
        return cfg

    def _build_forward(self):
        flip_pairs = self._inference_cfg["flip_pairs"]
        hflip = self._inference_cfg["hflip_tta"]
        scales = self._inference_cfg["multiscale_tta"]
        net = self.net
        decoder = self.decoder

        def run_scales(variables, image, mask):
            """Average heatmaps over TTA runs at the scale-1 resolution;
            tag sets come from the scale-1 run only (HigherHRNet recipe)."""
            from ...models.common import resize_bilinear

            n, height, width, _ = image.shape

            def one_scale(img_s):
                raw = net.net.apply(variables, img_s, train=False)
                heatmaps, tags = decoder.decouple_output(raw)
                if hflip:
                    raw_f = net.net.apply(
                        variables, img_s[:, :, ::-1, :], train=False
                    )
                    f_heatmaps, f_tags = decoder.decouple_output(raw_f)
                    # flip back width + joint channels (NHWC: channels
                    # last); permutation built at trace time from the real
                    # joint count (non-COCO layouts work)
                    flip_index = jnp.asarray(
                        flip_index_from_pairs(
                            flip_pairs, f_heatmaps[0].shape[-1]
                        )
                    )
                    f_heatmaps = [
                        h[:, :, ::-1, :][..., flip_index] for h in f_heatmaps
                    ]
                    f_tags = [t[:, :, ::-1, :][..., flip_index] for t in f_tags]
                    heatmaps = [
                        (h + f) * 0.5 for h, f in zip(heatmaps, f_heatmaps)
                    ]
                    tags = list(tags) + list(f_tags)  # both tag sets (L=2)
                # aggregate the levels at this run's largest resolution
                base = heatmaps[-1]
                hb, wb = base.shape[1:3]
                acc = base
                for hm in heatmaps[:-1]:
                    acc = acc + resize_bilinear(hm, hb, wb)
                return acc / len(heatmaps), list(tags)

            heatmap_1, tags_1 = one_scale(image)
            h1, w1 = heatmap_1.shape[1:3]
            acc = heatmap_1
            for s in scales:
                if s == 1.0:
                    continue
                # keep the model's expected 64-px alignment when rescaling
                hs = max(64, int(round(height * s / 64)) * 64)
                ws = max(64, int(round(width * s / 64)) * 64)
                img_s = jax.image.resize(
                    image, (n, hs, ws, image.shape[3]), "linear"
                )
                heatmap_s, _ = one_scale(img_s)
                acc = acc + resize_bilinear(heatmap_s, h1, w1)
            heatmap = acc / len(scales)
            # a single pre-aggregated level: decode applies mask/NMS/top-K
            return decoder.decode([heatmap], tags_1, mask)

        def forward(variables, image, mask):
            if not hflip and len(scales) == 1:
                out = net.apply(variables, image, mask)
                return out[0] if net.output_raw else out
            return run_scales(variables, image, mask)

        return jax.jit(forward)

    def infer(self, dataset) -> List[Dict[str, Any]]:
        if self._jit_forward is None:
            self._jit_forward = self._build_forward()

        batch_size = self._compiled_batch(getattr(dataset, "batch_size", None))
        outputs: List[Dict[str, Any]] = []
        for batch in dataset:
            n = len(batch["image"])
            image = np.asarray(batch["image"])
            mask = np.asarray(batch["mask"])
            if batch_size and n < batch_size:
                pad = batch_size - n
                image = np.concatenate([image, np.repeat(image[-1:], pad, 0)])
                mask = np.concatenate([mask, np.repeat(mask[-1:], pad, 0)])

            out = self._jit_forward(self.variables, *self._shard_inputs(image, mask))
            # trim padding before the (host) grouping pass
            val_k, tag_k, ind_k, heatmap, tagging_heatmap = (x[:n] for x in out)
            preds, scores = self._parse(val_k, tag_k, ind_k, heatmap, tagging_heatmap)

            center = np.asarray(batch["center"], np.float32)
            scale = np.asarray(batch["scale"], np.float32)
            image_shape = np.asarray(batch["image_shape"], np.float32)

            preds = transform_keypoints(
                preds,
                center,
                scale,
                image_shape / self._inference_cfg["downsample_scale"],
                pixel_std=self._inference_cfg["pixel_std"],
            )
            for pred, score, image_path in zip(preds, scores, batch["image_file"]):
                outputs.append(
                    dict(pred=pred, score=score, image_path=str(image_path))
                )
        return outputs

    def _parse(self, val_k, tag_k, ind_k, heatmap, tagging_heatmap):
        """Post-processing: group by tag, score, optionally refine."""
        if self._inference_cfg["device_grouping"]:
            from ...ops.grouping import match_by_tag_batch

            groups, valid = match_by_tag_batch(
                val_k, tag_k, ind_k,
                joint_order=list(self._inference_cfg["joint_order"]),
                vis_thr=self._inference_cfg["vis_thr"],
                tag_thr=self._inference_cfg["tag_thr"],
                ignore_too_much=self._inference_cfg["ignore_too_much"],
                use_rounded_norm=self._inference_cfg["use_rounded_norm"],
            )
            groups = np.asarray(groups)
            valid = np.asarray(valid)
            keypoints = [g[v] for g, v in zip(groups, valid)]
        else:
            keypoints = [
                match_by_tag(
                    v, t, i,
                    joint_order=self._inference_cfg["joint_order"],
                    vis_thr=self._inference_cfg["vis_thr"],
                    tag_thr=self._inference_cfg["tag_thr"],
                    ignore_too_much=self._inference_cfg["ignore_too_much"],
                    use_rounded_norm=self._inference_cfg["use_rounded_norm"],
                )
                for v, t, i in zip(
                    np.asarray(val_k), np.asarray(tag_k), np.asarray(ind_k)
                )
            ]

        scores = [[y[:, 2].mean() for y in x] for x in keypoints]

        if self._inference_cfg["refine_missing_joint"]:
            heatmap = np.asarray(heatmap)          # [N, H, W, K]
            tagging_heatmap = np.asarray(tagging_heatmap)  # [N, H, W, K, L]
            for i in range(len(keypoints)):
                for j in range(len(keypoints[i])):
                    keypoints[i][j] = self._refine_missing(
                        heatmap[i], tagging_heatmap[i], keypoints[i][j]
                    )
        return keypoints, scores

    def _refine_missing(
        self, heatmap: np.ndarray, tagging_heatmap: np.ndarray, keypoints: np.ndarray
    ) -> np.ndarray:
        """Fill undetected joints by tag-distance-penalized argmax
        (ref :189-249; NHWC layout here).

        heatmap: [H, W, K]; tagging_heatmap: [H, W, K, L]; keypoints: [K, 3+L].
        """
        h, w, k = heatmap.shape

        tags = []
        location = keypoints[:, :2].astype(np.int32)
        for i in range(k):
            if keypoints[i, 2] > 0:
                x, y = location[i]
                tags.append(tagging_heatmap[y, x, i])
        if not tags:
            return keypoints
        mean_tag = np.mean(tags, axis=0)

        dist = np.linalg.norm(tagging_heatmap - mean_tag[None, None, None, :], axis=3)
        dist = np.round(dist)  # [H, W, K]

        score = heatmap - dist
        flat = score.transpose(2, 0, 1).reshape(k, -1)
        max_loc = np.argmax(flat, axis=1)
        ys, xs = np.unravel_index(max_loc, (h, w))
        ys_int, xs_int = ys.copy(), xs.copy()
        xs = xs.astype(np.float32) + 0.5
        ys = ys.astype(np.float32) + 0.5

        for i in range(k):
            xx, yy = xs_int[i], ys_int[i]
            if heatmap[yy, min(xx + 1, w - 1), i] > heatmap[yy, max(xx - 1, 0), i]:
                xs[i] += 0.25
            else:
                xs[i] -= 0.25
            if heatmap[min(yy + 1, h - 1), xx, i] > heatmap[max(0, yy - 1), xx, i]:
                ys[i] += 0.25
            else:
                ys[i] -= 0.25

        vals = heatmap[ys_int, xs_int, np.arange(k)]
        full = np.stack((xs, ys, vals), axis=1)
        for i in range(k):
            if full[i, 2] > 0 and keypoints[i, 2] == 0:
                keypoints[i, :3] = full[i]
        return keypoints

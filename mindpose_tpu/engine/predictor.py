"""Serving API: raw image + person boxes -> keypoints, one compiled call.

The reference stops at dataset-driven evaluation loops; deployment users need
a direct predictor. ``TopDownPredictor`` owns the compiled forward+decode for
a fixed batch size (padding partial batches so XLA never recompiles), runs
the same host-side crop geometry as the val pipeline, and returns keypoints
in the original image frame.
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transform.topdown_transform import (
    TopDownAffine,
    TopDownBoxToCenterScale,
)
from ..models.model_factory import (
    create_decoder,
    create_eval_network,
    create_network,
)

__all__ = ["TopDownPredictor", "BottomUpPredictor"]


class TopDownPredictor:
    """Single-image multi-instance top-down predictor.

    Args:
        net: a ``Net`` module (or None to build from names).
        variables: the net's variable collection.
        dataset_setting: the config's dataset_setting dict (image_size,
            heatmap_size, pixel_std, scale_padding, flip_pairs,
            upper_body_ids).
        decoder_setting: decoder kwargs (use_udp, shift_coordinate, ...).
        batch_size: compiled batch size; boxes are processed in padded
            chunks of this size.
    """

    def __init__(
        self,
        net,
        variables,
        dataset_setting: Dict[str, Any],
        decoder_setting: Optional[Dict[str, Any]] = None,
        normalize_mean=(0.485, 0.456, 0.406),
        normalize_std=(0.229, 0.224, 0.225),
        batch_size: int = 32,
        decoder_name: str = "topdown_heatmap",
        quantize: str = "",
    ) -> None:
        self.net = net
        self.variables = variables
        self.batch_size = batch_size
        self.mean = np.asarray(normalize_mean, np.float32) * 255.0
        self.std = np.asarray(normalize_std, np.float32) * 255.0

        setting = dict(dataset_setting)
        setting.setdefault("upper_body_ids", list(range(11)))
        self._to_cs = TopDownBoxToCenterScale(is_train=False, config=setting)
        use_udp = bool((decoder_setting or {}).get("use_udp", False))
        self._affine = TopDownAffine(is_train=False, config=setting, use_udp=use_udp)

        decoder = create_decoder(decoder_name, **(decoder_setting or {}))
        eval_net = create_eval_network(net, decoder, output_raw=False)
        if quantize == "int8":
            # int8 kernels + per-channel scales; the dequantize traces
            # inside the jit so weights live in HBM as int8
            # (models/quantize.py)
            from ..models.quantize import (
                quantize_variables,
                quantized_eval_apply,
            )

            qfwd = quantized_eval_apply(
                eval_net, quantize_variables(variables))
            self._forward = lambda _variables, *inputs: qfwd(*inputs)
        elif quantize:
            raise ValueError(f"unknown quantize mode: {quantize!r}")
        else:
            self._forward = jax.jit(eval_net.apply)

    @classmethod
    def from_config(cls, args, variables, **kwargs) -> "TopDownPredictor":
        """Build from a parsed config namespace + restored variables."""
        net = create_network(
            backbone_name=args.backbone_name,
            head_name=args.head_name,
            neck_name=getattr(args, "neck_name", "") or "",
            num_joints=args.num_joints,
            backbone_args=getattr(args, "backbone_setting", None),
            head_args=getattr(args, "head_setting", None),
        )
        return cls(
            net,
            variables,
            dataset_setting=args.dataset_setting,
            decoder_setting=getattr(args, "decoder_setting", None),
            normalize_mean=args.normalize_mean,
            normalize_std=args.normalize_std,
            decoder_name=getattr(args, "decoder_name", "topdown_heatmap")
            or "topdown_heatmap",
            **kwargs,
        )

    def __call__(
        self, image: np.ndarray, boxes: np.ndarray, box_scores=None
    ) -> np.ndarray:
        """Predict keypoints for each xywh box in an RGB uint8 image.

        Returns [M, K, 3] (x, y, score) in the original image frame.
        """
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        m = len(boxes)
        if box_scores is None:
            box_scores = np.ones(m, np.float32)

        crops, centers, scales = [], [], []
        for box in boxes:
            state = {"boxes": box, "image": image, "rotation": 0.0}
            state.update(self._to_cs.transform(state))
            state.update(self._affine.transform(state))
            crop = (state["image"].astype(np.float32) - self.mean) / self.std
            crops.append(crop)
            centers.append(state["center"])
            scales.append(state["scale"])

        preds_all = []
        bs = self.batch_size
        for i in range(0, m, bs):
            chunk = slice(i, min(i + bs, m))
            n = chunk.stop - chunk.start
            pad = bs - n
            imgs = np.stack(crops[chunk])
            cen = np.stack(centers[chunk]).astype(np.float32)
            sca = np.stack(scales[chunk]).astype(np.float32)
            sco = np.asarray(box_scores[chunk], np.float32)
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
                cen = np.concatenate([cen, np.repeat(cen[-1:], pad, 0)])
                sca = np.concatenate([sca, np.repeat(sca[-1:], pad, 0)])
                sco = np.concatenate([sco, np.repeat(sco[-1:], pad, 0)])
            preds, _ = self._forward(
                self.variables, jnp.asarray(imgs), jnp.asarray(cen),
                jnp.asarray(sca), jnp.asarray(sco),
            )
            preds_all.append(np.asarray(preds)[:n])
        return np.concatenate(preds_all)


class BottomUpPredictor:
    """Single-image multi-person bottom-up predictor (no detector needed).

    Wraps the full bottom-up inference path — rescale+pad host transforms,
    jitted forward + multi-resolution AE decode, tag grouping, coordinate
    rescaling — behind ``predictor(image) -> (preds [M, K, 3+], scores [M])``
    in the original image frame. Uses the same BottomUpHeatMapAEInferencer
    machinery as the eval CLI, fed with a synthetic one-batch dataset.

    Args:
        net: an ``EvalNet``-compatible wrapper is built internally; pass the
            raw ``Net`` (backbone+higher_hrnet_head).
        variables: the net's variable collection.
        dataset_setting: dataset_setting dict (max_image_size, pixel_std,
            flip_pairs, ...).
        eval_setting: eval_setting dict (joint_order, tag_thr, vis_thr,
            downsample_scale, ...).
    """

    def __init__(
        self,
        net,
        variables,
        dataset_setting: Dict[str, Any],
        eval_setting: Dict[str, Any],
        decoder_setting: Optional[Dict[str, Any]] = None,
        normalize_mean=(0.485, 0.456, 0.406),
        normalize_std=(0.229, 0.224, 0.225),
    ) -> None:
        from ..data.transform.bottomup_transform import BottomUpPad, BottomUpRescale
        from ..engine.factory import create_inferencer

        self.mean = np.asarray(normalize_mean, np.float32) * 255.0
        self.std = np.asarray(normalize_std, np.float32) * 255.0

        setting = dict(dataset_setting)
        # pad to a square max so landscape and portrait share one compiled
        # shape (see data_factory's batched bottom-up eval rule)
        mw, mh = setting["max_image_size"]
        side = max(int(mw), int(mh))
        setting["max_image_size"] = [side, side]
        self._rescale = BottomUpRescale(is_train=False, config=setting)
        self._pad = BottomUpPad(is_train=False, config=setting)

        self._num_joints = int((decoder_setting or {}).get("num_joints", 17))
        decoder = create_decoder(
            "bottomup_heatmap_ae", **(decoder_setting or {})
        )
        eval_net = create_eval_network(
            net, decoder, output_raw=eval_setting.get("has_heatmap_output", True)
        )
        self._inferencer = create_inferencer(
            eval_net,
            name="bottomup_heatmap_ae",
            config=dict(eval_setting),
            dataset_config=setting,
            variables=variables,
        )

    def __call__(self, image: np.ndarray):
        """Predict all persons in an RGB uint8 image.

        Returns ``(preds, scores)``: keypoints [M, K, 3+] in the original
        image frame and per-instance scores [M].
        """
        state = {"image": np.asarray(image)}
        state.update(self._rescale.transform(state))
        state.update(self._pad.transform(state))
        img = (state["image"].astype(np.float32) - self.mean) / self.std

        batch = {
            "image": img[None],
            "mask": np.asarray(state["mask"], np.float32)[None],
            "center": np.asarray(state["center"], np.float32)[None],
            "scale": np.asarray(state["scale"], np.float32)[None],
            "image_shape": np.asarray(state["image_shape"], np.float32)[None],
            "image_file": ["<memory>"],
        }
        records = self._inferencer.infer([batch])
        empty = (
            np.zeros((0, self._num_joints, 3), np.float32),
            np.zeros((0,), np.float32),
        )
        if not records:
            return empty
        rec = records[0]
        preds = np.asarray(rec["pred"], np.float32)
        if preds.size == 0:
            return empty
        scores = np.asarray(rec["score"], np.float32).reshape(-1)
        return preds, scores

    @classmethod
    def from_config(cls, args, variables) -> "BottomUpPredictor":
        net = create_network(
            backbone_name=args.backbone_name,
            head_name=args.head_name,
            neck_name=getattr(args, "neck_name", "") or "",
            num_joints=args.num_joints,
            backbone_args=getattr(args, "backbone_setting", None),
            head_args=getattr(args, "head_setting", None),
        )
        return cls(
            net,
            variables,
            dataset_setting=args.dataset_setting,
            eval_setting=args.eval_setting,
            decoder_setting=getattr(args, "decoder_setting", None),
            normalize_mean=args.normalize_mean,
            normalize_std=args.normalize_std,
        )

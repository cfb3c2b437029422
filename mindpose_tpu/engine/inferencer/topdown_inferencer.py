"""Top-down heatmap inferencer with optional hflip TTA.

Parity: /root/reference/mindpose/engine/inferencer/topdown_inferencer.py:16-187.
The forward + (TTA merge) + decode runs as ONE jitted device function; ragged
final batches are padded to the compiled batch size (static shapes for XLA)
and the padding is trimmed on host.
"""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...data.transform.utils import flip_index_from_pairs
from ...register import register
from .inferencer import Inferencer


@register("inferencer", extra_name="topdown_heatmap")
class TopDownHeatMapInferencer(Inferencer):
    def __init__(self, net, variables=None, config=None, progress_bar=False,
                 decoder=None, mesh=None):
        super().__init__(net, variables=variables, config=config, mesh=mesh)
        self.progress_bar = progress_bar
        self.decoder = decoder if decoder is not None else net.decoder

        if self._inference_cfg["hflip_tta"]:
            if not self._inference_cfg["has_heatmap_output"]:
                raise ValueError("flip TTA needs heatmap output.")
        self._jit_forward = None

    def load_inference_cfg(self) -> Dict[str, Any]:
        cfg = dict()
        cfg["has_heatmap_output"] = self.config["has_heatmap_output"]
        cfg["hflip_tta"] = self.config["hflip_tta"]
        cfg["shift_heatmap"] = self.config["shift_heatmap"]
        cfg["flip_pairs"] = np.array(self.config["flip_pairs"])
        return cfg

    def _build_forward(self):
        flip_pairs = self._inference_cfg["flip_pairs"]
        shift_heatmap = self._inference_cfg["shift_heatmap"]
        hflip = self._inference_cfg["hflip_tta"]
        net = self.net
        decoder = self.decoder

        def forward(variables, image, center, scale, score):
            if not hflip:
                out = net.apply(variables, image, center, scale, score)
                return out[0] if net.output_raw else out

            # TTA: average heatmap with channel-flipped horizontal mirror
            heatmap = net.net.apply(variables, image, train=False)
            flipped = net.net.apply(variables, image[:, :, ::-1, :], train=False)
            # flip back: mirror width, swap left/right joints (NHWC: K last);
            # the permutation is built at trace time from the real channel
            # count so non-COCO joint layouts (e.g. MPII 16) work
            flip_index = jnp.asarray(
                flip_index_from_pairs(flip_pairs, flipped.shape[-1])
            )
            flipped = flipped[:, :, ::-1, :][..., flip_index]
            if shift_heatmap:
                # 1-px right shift of the flipped map (ref :185-187)
                flipped = jnp.concatenate(
                    [flipped[:, :, :1, :], flipped[:, :, :-1, :]], axis=2
                )
            final = (heatmap + flipped) * 0.5
            return decoder(final, center, scale, score)

        return jax.jit(forward)

    def infer(self, dataset) -> List[Dict[str, Any]]:
        if self._jit_forward is None:
            self._jit_forward = self._build_forward()

        batch_size = self._compiled_batch(getattr(dataset, "batch_size", None))
        outputs: List[Dict[str, Any]] = []
        for batch in dataset:
            n = len(batch["bbox_ids"])
            image = batch["image"]
            center = batch["center"].astype(np.float32)
            scale = batch["scale"].astype(np.float32)
            score = batch["bbox_scores"].astype(np.float32)
            if batch_size and n < batch_size:
                pad = batch_size - n
                image = np.concatenate([image, np.repeat(image[-1:], pad, 0)])
                center = np.concatenate([center, np.repeat(center[-1:], pad, 0)])
                scale = np.concatenate([scale, np.repeat(scale[-1:], pad, 0)])
                score = np.concatenate([score, np.repeat(score[-1:], pad, 0)])

            preds, boxes = self._jit_forward(
                self.variables, *self._shard_inputs(image, center, scale, score)
            )
            preds = np.asarray(preds)[:n]
            boxes = np.asarray(boxes)[:n]

            for pred, box, image_path, bbox_id in zip(
                preds, boxes, batch["image_file"], batch["bbox_ids"]
            ):
                outputs.append(
                    dict(
                        pred=pred.tolist(),
                        box=box.tolist(),
                        image_path=str(image_path),
                        bbox_id=int(bbox_id),
                    )
                )
        return outputs

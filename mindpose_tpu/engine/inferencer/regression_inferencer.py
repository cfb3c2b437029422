"""Regression inferencer: hflip TTA in normalized-coordinate space.

Beyond the reference: TTA for the RLE regression family (configs/rle). The
heatmap inferencer's TTA merge is heatmap-shaped (mirror width, 1-px
shift); here the mirror is algebraic. A horizontal flip maps pixel x to
(W-1) - x, so a normalized prediction ``mu`` from the flipped view maps
back as ``1 - 1/W - mu`` on the x axis; left/right joints swap via the
flip-pair permutation. The two views' coordinates are averaged; sigmas are
averaged after the same permutation (uncertainty is view-symmetric).
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...data.transform.utils import flip_index_from_pairs
from ...register import register
from .inferencer import Inferencer
from .topdown_inferencer import TopDownHeatMapInferencer


@register("inferencer", extra_name="regression")
class RegressionInferencer(TopDownHeatMapInferencer):
    def __init__(self, net, variables=None, config=None, progress_bar=False,
                 decoder=None, mesh=None):
        # bypass TopDownHeatMapInferencer.__init__'s heatmap-output check:
        # regression TTA needs (mu, sigma), not heatmaps
        Inferencer.__init__(self, net, variables=variables, config=config,
                            mesh=mesh)
        self.progress_bar = progress_bar
        self.decoder = decoder if decoder is not None else net.decoder
        self._jit_forward = None

    def load_inference_cfg(self) -> Dict[str, Any]:
        cfg = dict()
        cfg["has_heatmap_output"] = self.config.get("has_heatmap_output",
                                                    False)
        cfg["hflip_tta"] = self.config["hflip_tta"]
        cfg["shift_heatmap"] = False  # heatmap-path knob; n/a here
        cfg["flip_pairs"] = np.array(self.config["flip_pairs"])
        return cfg

    def _build_forward(self):
        flip_pairs = self._inference_cfg["flip_pairs"]
        hflip = self._inference_cfg["hflip_tta"]
        net = self.net
        decoder = self.decoder
        inv_w = 1.0 / float(decoder.input_size[0])

        def forward(variables, image, center, scale, score):
            if not hflip:
                out = net.apply(variables, image, center, scale, score)
                return out[0] if net.output_raw else out

            mu, sigma = net.net.apply(variables, image, train=False)
            muf, sigmaf = net.net.apply(variables, image[:, :, ::-1, :],
                                        train=False)
            # swap left/right joints, mirror the x axis back; permutation
            # built at trace time from the real joint count
            flip_index = jnp.asarray(
                flip_index_from_pairs(flip_pairs, muf.shape[1])
            )
            muf = muf[:, flip_index]
            sigmaf = sigmaf[:, flip_index]
            muf = jnp.stack(
                [1.0 - inv_w - muf[..., 0], muf[..., 1]], axis=-1
            )
            mu = (mu + muf) * 0.5
            sigma = (sigma + sigmaf) * 0.5
            return decoder((mu, sigma), center, scale, score)

        return jax.jit(forward)

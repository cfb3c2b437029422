"""SimCC inferencer: hflip TTA in bin space.

Beyond the reference: TTA for the SimCC family (configs/simcc). The
heatmap inferencer's TTA merge is heatmap-shaped (mirror width, 1-px
shift); here the mirror happens on the x bin axis instead. For a horizontal
flip, pixel x maps to (W-1) - x, i.e. bin b = x*ratio maps to
(W-1)*ratio - b; reversing the bin axis gives (B-1) - b, which overshoots
by ratio - 1 bins — realigned by a (ratio-1)-bin left shift (the analogue
of the heatmap path's shift_heatmap). The two views' log-probabilities are
averaged (normalized geometric mean after the decoder's softmax).
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...data.transform.utils import flip_index_from_pairs
from ...register import register
from .inferencer import Inferencer
from .topdown_inferencer import TopDownHeatMapInferencer


@register("inferencer", extra_name="simcc")
class SimCCInferencer(TopDownHeatMapInferencer):
    def __init__(self, net, variables=None, config=None, progress_bar=False,
                 decoder=None, mesh=None):
        # bypass TopDownHeatMapInferencer.__init__'s heatmap-output check:
        # SimCC TTA needs logits, not heatmaps
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
        cfg["shift_heatmap"] = False  # heatmap-path knob; n/a for bins
        cfg["flip_pairs"] = np.array(self.config["flip_pairs"])
        return cfg

    def _build_forward(self):
        flip_pairs = self._inference_cfg["flip_pairs"]
        hflip = self._inference_cfg["hflip_tta"]
        net = self.net
        decoder = self.decoder
        shift = int(round(decoder.split_ratio)) - 1

        def forward(variables, image, center, scale, score):
            if not hflip:
                out = net.apply(variables, image, center, scale, score)
                return out[0] if net.output_raw else out

            xl, yl = net.net.apply(variables, image, train=False)
            xlf, ylf = net.net.apply(variables, image[:, :, ::-1, :],
                                     train=False)
            # swap left/right joints, mirror the x bin axis, realign;
            # permutation built at trace time from the real joint count
            flip_index = jnp.asarray(
                flip_index_from_pairs(flip_pairs, xlf.shape[1])
            )
            xlf = xlf[:, flip_index, ::-1]
            ylf = ylf[:, flip_index, :]
            if shift > 0:
                xlf = jnp.concatenate(
                    [xlf[..., shift:],
                     jnp.repeat(xlf[..., -1:], shift, axis=-1)], axis=-1)
            mx = (jax.nn.log_softmax(xl, axis=-1)
                  + jax.nn.log_softmax(xlf, axis=-1)) * 0.5
            my = (jax.nn.log_softmax(yl, axis=-1)
                  + jax.nn.log_softmax(ylf, axis=-1)) * 0.5
            return decoder((mx, my), center, scale, score)

        return jax.jit(forward)

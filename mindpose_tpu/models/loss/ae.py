"""Associative-embedding (grouping) loss.

Parity: /root/reference/mindpose/models/loss/ae.py:11-89 ("End-to-End Learning
for Joint Detection and Grouping", arXiv:1611.05424).

TPU-native formulation: instead of scattering tag indices into a dense
[N, M, K, H, W] mask and reducing (the reference's approach, O(N*M*K*H*W)
memory), tag values are *gathered* at the ground-truth keypoint positions —
O(N*M*K) — which is exactly equivalent and XLA-friendly.
"""
import dataclasses

import jax.numpy as jnp

from ...register import register
from .loss import Loss


@register("loss", extra_name="ae")
@dataclasses.dataclass(frozen=True)
class AELoss(Loss):
    """Pull/push grouping loss over tag heatmaps.

    Inputs (tag_per_joint=True):
        pred: tag heatmaps [N, H, W, K]
        target: tag indices [N, M, K, 2] — (flat index into H*W, valid flag)
    Inputs (tag_per_joint=False):
        pred: [N, H, W]; target: [N, M, 2]

    Output: stacked [push_loss, pull_loss].
    """

    tag_per_joint: bool = True
    eps: float = 0.01

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if not self.tag_per_joint:
            pred = pred[..., None]  # [N, H, W, 1]
            target = target[:, :, None, :]  # [N, M, 1, 2]

        pred = pred.astype(jnp.float32)
        n, h, w, k = pred.shape
        m = target.shape[1]

        pred_flat = pred.reshape(n, h * w, k)
        ind = target[..., 0].astype(jnp.int32)  # [N, M, K]
        valid = target[..., 1].astype(jnp.float32)  # [N, M, K]

        # tag value at each annotated keypoint position
        tags = jnp.take_along_axis(pred_flat, ind, axis=1)  # [N, M, K]
        tags = tags * valid

        # per-instance reference embedding
        k_n = valid.sum(axis=2)  # [N, M]
        h_n = tags.sum(axis=2) / (k_n + self.eps)  # [N, M]

        # pull loss: tags toward their instance embedding
        diff = (h_n[:, :, None] - tags) * valid
        pull = jnp.square(diff).sum(axis=2) / (k_n + self.eps)  # [N, M]
        inst_mask = (k_n > 0).astype(jnp.float32)  # [N, M]
        num_inst = inst_mask.sum(axis=1)  # [N]
        pull_loss = pull.sum(axis=1) / (num_inst + self.eps)

        # push loss: instance embeddings apart
        a = h_n[:, :, None]
        b = h_n[:, None, :]
        push = jnp.exp(-jnp.square(a - b))  # [N, M, M]
        pair_mask = inst_mask[:, :, None] * inst_mask[:, None, :]
        push = (push * pair_mask).sum(axis=(1, 2)) - num_inst  # remove diagonal
        push_loss = 0.5 * push / (num_inst * (num_inst - 1) + self.eps)

        return jnp.stack([self.get_loss(push_loss), self.get_loss(pull_loss)])

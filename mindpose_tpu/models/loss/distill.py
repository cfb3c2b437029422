"""Heatmap knowledge distillation loss (teacher-in-the-loop).

Beyond the reference: standard output distillation for pose (as in FPD,
"Fast Human Pose Estimation", CVPR 2019) — the student regresses its usual
Gaussian targets AND the frozen teacher's predicted heatmaps on the same
augmented batch. The teacher forward runs inside the jitted train step (a
``preprocess`` column appended by tools/train.py), so distillation costs
one extra inference per step and fuses with the rest of the graph — no
host round-trips, no precomputed heatmap storage.

Returns a stacked ``[task, distill]`` loss vector: the train step sums
components for the backward pass and logs them separately.
"""
import dataclasses

import jax
import jax.numpy as jnp

from ...register import register
from .loss import Loss


@register("loss", extra_name="joint_mse_distill")
@dataclasses.dataclass(frozen=True)
class JointsMSEDistillLoss(Loss):
    """MSE(pred, target) + alpha * MSE(pred, teacher_pred).

    Inputs: pred/target/teacher_pred [N, H, W, K]; target_weight [N, K].
    ``use_target_weight`` gates both terms by joint visibility (an occluded
    joint's teacher belief is as unsupervised as its Gaussian target).
    """

    use_target_weight: bool = True
    alpha: float = 0.5

    def __call__(
        self,
        pred: jnp.ndarray,
        target: jnp.ndarray,
        target_weight: jnp.ndarray,
        teacher_pred: jnp.ndarray,
    ) -> jnp.ndarray:
        pred = pred.astype(jnp.float32)
        task = jnp.square(pred - target.astype(jnp.float32))
        distill = jnp.square(
            pred - jax.lax.stop_gradient(teacher_pred.astype(jnp.float32))
        )
        weights = (
            target_weight[:, None, None, :] if self.use_target_weight else None
        )
        return jnp.stack(
            [self.get_loss(task, weights),
             self.alpha * self.get_loss(distill, weights)]
        )

"""Teacher-in-the-loop knowledge distillation plumbing.

Beyond the reference. The frozen teacher's forward runs INSIDE the jitted
train step as part of the ``preprocess`` hook (parallel/train.py): it
appends the teacher's predicted heatmaps as one more batch column, which
``joint_mse_distill`` (models/loss/distill.py) consumes as its extra
input. Under data parallelism the teacher inference shards with the batch
like every other preprocess op; teacher weights are captured as jit
constants (one replicated copy in HBM, never differentiated).

Config surface (tools/train.py):

    loss: joint_mse_distill
    loss_setting: {use_target_weight: true, alpha: 0.5}
    distill_setting:
      teacher_backbone: hrnet_w48
      teacher_head: hrnet_head
      teacher_backbone_setting: {}
      teacher_head_setting: {}
      teacher_ckpt: ckpt/hrnet_w48_tpu_best.ckpt
"""
from typing import Any, Callable, Dict, Optional

from ..utils.checkpoint import load_variables
from .model_factory import create_network

__all__ = ["build_teacher", "build_teacher_preprocess"]


def build_teacher(
    distill_setting: Dict[str, Any], num_joints: int, in_channels: int = 3
):
    """(teacher_net, teacher_variables) from a distill_setting dict.

    The checkpoint may be a saved TrainState (params/batch_stats at the
    top level) or a bare variables tree.
    """
    net = create_network(
        backbone_name=distill_setting["teacher_backbone"],
        head_name=distill_setting["teacher_head"],
        neck_name=distill_setting.get("teacher_neck", "") or "",
        num_joints=num_joints,
        in_channels=in_channels,
        backbone_args=distill_setting.get("teacher_backbone_setting"),
        head_args=distill_setting.get("teacher_head_setting"),
    )
    ckpt = distill_setting.get("teacher_ckpt")
    if not ckpt:
        raise ValueError("distill_setting.teacher_ckpt is required")
    variables = load_variables(ckpt)
    return net, variables


def build_teacher_preprocess(
    teacher_net,
    teacher_variables,
    base_preprocess: Optional[Callable] = None,
) -> Callable:
    """Wrap ``preprocess`` so it appends the teacher's heatmaps.

    Column contract in = out of ``base_preprocess`` (or the raw loader
    columns): (image, target, target_weight, ...); the teacher consumes
    column 0 (the normalized image the student sees) and its output is
    appended last, where the loss's ``*extra_inputs`` picks it up.
    """

    def preprocess(*cols):
        if base_preprocess is not None:
            cols = base_preprocess(*cols)
        teacher_out = teacher_net.apply(
            teacher_variables, cols[0], train=False
        )
        return tuple(cols) + (teacher_out,)

    return preprocess

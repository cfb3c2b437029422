"""mindpose_tpu: a TPU-native (JAX/XLA/Pallas) 2D human pose estimation framework.

Re-designed from the capabilities of mindspore-lab/mindpose: top-down
(SimpleBaseline, HRNet, UDP) and bottom-up (HigherHRNet + associative
embedding) COCO keypoint estimation, with jit/shard_map training over device
meshes and on-device encode/decode.
"""
from .version import __version__

from . import callbacks, data, engine, models, optim, parallel, scheduler, utils  # noqa: F401
from .data import create_dataset, create_pipeline  # noqa: F401
from .engine import create_evaluator, create_inferencer  # noqa: F401
from .models import (  # noqa: F401
    create_backbone,
    create_decoder,
    create_eval_network,
    create_head,
    create_loss,
    create_neck,
    create_network,
    create_network_with_loss,
)
from .optim import create_optimizer  # noqa: F401
from .register import entrypoint, list_components, list_modules, register  # noqa: F401
from .scheduler import create_lr_scheduler  # noqa: F401

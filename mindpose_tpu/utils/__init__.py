from .coco import COCO
from .cocoeval import COCOeval
from .match import match_by_tag
from .nms import oks_iou, oks_nms, soft_oks_nms
from .checkpoint import (
    load_checkpoint,
    load_pretrained_backbone,
    restore_train_state,
    save_checkpoint,
    wait_pending_checkpoints,
)
from .misc import AverageMeter, StepTimer, allreduce_mean

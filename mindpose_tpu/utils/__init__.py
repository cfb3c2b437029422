from .coco import COCO
from .cocoeval import COCOeval
from .match import match_by_tag
from .nms import oks_iou, oks_nms, soft_oks_nms

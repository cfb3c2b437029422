from . import backbones, decoders, heads, loss, necks
from .model_factory import (
    create_backbone,
    create_decoder,
    create_eval_network,
    create_head,
    create_loss,
    create_neck,
    create_network,
    create_network_with_loss,
)
from .distill import build_teacher, build_teacher_preprocess
from .networks import EvalNet, Net, NetWithLoss

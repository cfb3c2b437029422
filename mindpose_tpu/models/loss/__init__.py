from .ae import AELoss
from .distill import JointsMSEDistillLoss
from .loss import Loss
from .mse import JointsMSELoss, JointsMSELossWithMask
from .multi_loss import AEMultiLoss
from .simcc import KLDiscretLoss
from .rle import RLELoss

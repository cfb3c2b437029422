from .head import Head
from .higher_hrnet_head import HigherHRNetHead
from .hrnet_head import HRNetHead
from .simple_baseline_head import SimpleBaselineHead
from .simcc_head import SimCCHead
from .rle_head import RLERegressionHead

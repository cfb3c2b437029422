from .bottom_up_decoder import BottomUpHeatMapAEDecoder
from .decoder import Decoder
from .top_down_decoder import TopDownHeatMapDecoder
from .simcc_decoder import SimCCDecoder
from .regression_decoder import RegressionDecoder

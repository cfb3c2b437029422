from . import evaluator, inferencer
from .export import export_eval_net, export_serving_fn, load_serving_fn
from .factory import create_evaluator, create_inferencer
from .predictor import BottomUpPredictor, TopDownPredictor
from .server import PoseService, build_http_server

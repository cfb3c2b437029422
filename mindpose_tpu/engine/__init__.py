from . import evaluator, inferencer
from .factory import create_evaluator, create_inferencer
from .predictor import BottomUpPredictor, TopDownPredictor

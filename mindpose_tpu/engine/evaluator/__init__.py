from .bottomup_evaluator import BottomUpEvaluator
from .evaluator import Evaluator
from .keypoint_evaluator import TopDownKeypointEvaluator
from .topdown_evaluator import TopDownEvaluator

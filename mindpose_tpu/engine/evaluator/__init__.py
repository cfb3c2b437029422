from .bottomup_evaluator import BottomUpEvaluator
from .evaluator import Evaluator
from .topdown_evaluator import TopDownEvaluator

from . import bottomup_transform, topdown_transform, utils
from .transform import Transform

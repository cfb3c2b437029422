from .neck import Neck

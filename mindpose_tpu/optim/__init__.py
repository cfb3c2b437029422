from .optim_factory import create_optimizer

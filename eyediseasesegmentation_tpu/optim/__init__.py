from .optimizers import get_optimizer, madgrad, lookahead, diffgrad
from .schedulers import get_scheduler

__all__ = ["get_optimizer", "get_scheduler", "madgrad", "lookahead", "diffgrad"]

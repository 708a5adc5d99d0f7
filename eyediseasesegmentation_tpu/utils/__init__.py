from .seeding import set_global_seed, key_iter
from .grid import make_grid
from .artifacts import save_output, make_logdir, log_pretty_table, minmax_normalize

__all__ = [
    "set_global_seed",
    "key_iter",
    "make_grid",
    "save_output",
    "make_logdir",
    "log_pretty_table",
    "minmax_normalize",
]

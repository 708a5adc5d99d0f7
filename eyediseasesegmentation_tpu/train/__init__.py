from .checkpoint import save_checkpoint, load_checkpoint, restore_into
from .param_groups import lr_scale_fn_for, wd_mask_for
from .trainer import TrainState, Trainer, train_model

__all__ = [
    "save_checkpoint", "load_checkpoint", "restore_into",
    "lr_scale_fn_for", "wd_mask_for",
    "TrainState", "Trainer", "train_model",
]

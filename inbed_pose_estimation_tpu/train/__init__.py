from .checkpoint import (
    convert_torch_adam_state,
    convert_torch_state_dict,
    flatten_opt_state,
    latest_checkpoint,
    load_checkpoint,
    load_torch_checkpoint,
    restore_opt_state,
    save_checkpoint,
)
from .fits_dict import FitsStore, fits_get, fits_set
from .trainer import TrainState, Trainer, make_train_step

__all__ = [
    "convert_torch_adam_state",
    "convert_torch_state_dict",
    "flatten_opt_state",
    "restore_opt_state",
    "latest_checkpoint",
    "load_checkpoint",
    "load_torch_checkpoint",
    "save_checkpoint",
    "FitsStore",
    "fits_get",
    "fits_set",
    "TrainState",
    "Trainer",
    "make_train_step",
]

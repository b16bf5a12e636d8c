from fdtpu.train.state import TrainState, init_train_state, make_optimizer
from fdtpu.train.trainer import Trainer, get_training_params
from fdtpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    get_best_checkpoint,
    scheduler_from_meta,
    scheduler_to_meta,
)

__all__ = [
    "TrainState",
    "init_train_state",
    "make_optimizer",
    "Trainer",
    "get_training_params",
    "save_checkpoint",
    "load_checkpoint",
    "get_best_checkpoint",
    "scheduler_from_meta",
    "scheduler_to_meta",
]

from .train import (
    TrainConfig,
    train,
    make_train_step,
    train_multi_scenario,
    train_conditioned,
    train_conv,
)
from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    save_opt_state,
    load_opt_state,
)

__all__ = [
    "TrainConfig",
    "train",
    "make_train_step",
    "train_multi_scenario",
    "train_conditioned",
    "train_conv",
    "save_checkpoint",
    "load_checkpoint",
    "save_opt_state",
    "load_opt_state",
]

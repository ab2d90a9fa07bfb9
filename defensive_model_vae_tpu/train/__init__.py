from .train import TrainConfig, train, make_train_step, train_multi_scenario
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "TrainConfig",
    "train",
    "make_train_step",
    "train_multi_scenario",
    "save_checkpoint",
    "load_checkpoint",
]

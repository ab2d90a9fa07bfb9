from .fused_trainer import (
    fused_train,
    fused_train_multi,
    fused_train_seeds,
    FUSED_METRIC_KEYS,
)

__all__ = [
    "fused_train",
    "fused_train_multi",
    "fused_train_seeds",
    "FUSED_METRIC_KEYS",
]

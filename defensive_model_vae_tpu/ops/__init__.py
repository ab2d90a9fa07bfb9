from .fused_trainer import (
    fused_train,
    fused_train_multi,
    fused_train_seeds,
    FUSED_METRIC_KEYS,
)
from .fused_scale import fused_train_scale, fused_train_scale_dp

__all__ = [
    "fused_train",
    "fused_train_multi",
    "fused_train_seeds",
    "fused_train_scale",
    "fused_train_scale_dp",
    "FUSED_METRIC_KEYS",
]

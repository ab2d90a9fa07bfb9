from .fused_trainer import fused_train, FUSED_METRIC_KEYS

__all__ = ["fused_train", "FUSED_METRIC_KEYS"]

from .profiling import StageTimer, trace_to
from .reporting import MetricWriter

__all__ = ["StageTimer", "trace_to", "MetricWriter"]

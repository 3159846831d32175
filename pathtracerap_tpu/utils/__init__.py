from .checkpoint import RenderCheckpoint, save_checkpoint, load_checkpoint
from .metrics import RenderMetrics, MetricsLogger
from .profiling import profile_trace, annotate

__all__ = [
    "RenderCheckpoint",
    "save_checkpoint",
    "load_checkpoint",
    "RenderMetrics",
    "MetricsLogger",
    "profile_trace",
    "annotate",
]

from rso.metrics.ate import ate_rmse, rpe
from rso.metrics.logging import VOLogger, error_name
from rso.metrics.profiler import SpanProfiler

__all__ = ["ate_rmse", "rpe", "VOLogger", "error_name", "SpanProfiler"]

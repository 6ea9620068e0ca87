"""Shared utilities: logging, metric writers, file naming, results IO."""

from .logging import MetricsWriter, make_metrics_writer, print_green, print_red
from .io import get_filename, append_results, global_minibatch_number
from .profiling import StepTimer, annotate, trace
from .debug import live_array_report, print_live_arrays

__all__ = [
    "MetricsWriter",
    "make_metrics_writer",
    "print_green",
    "print_red",
    "get_filename",
    "append_results",
    "global_minibatch_number",
    "StepTimer",
    "annotate",
    "trace",
    "live_array_report",
    "print_live_arrays",
]

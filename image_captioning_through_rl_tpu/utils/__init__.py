"""Shared utilities: logging, metric writers, file naming, results IO."""

from .logging import MetricsWriter, make_metrics_writer, print_green, print_red
from .io import get_filename, append_results, global_minibatch_number

__all__ = [
    "MetricsWriter",
    "make_metrics_writer",
    "print_green",
    "print_red",
    "get_filename",
    "append_results",
    "global_minibatch_number",
]

"""Command-line driver."""

from .main import build_arg_parser, main, setup

__all__ = ["build_arg_parser", "main", "setup"]

"""Status printing and training-metric writers.

The reference logs scalars to TensorBoard under specific tag names
(``{Value,Policy,Reward} Network-loss``, ``A2C Network-episodic-*``,
``A2C Curriculum Level-{L}-*`` — trainers.py:188,250,299,489-492,
598-603); trainers here emit the same tags. The writer backend is
pluggable: TensorBoard when available, JSONL always (cheap, greppable,
no deps), or both.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Protocol


def print_green(text: str) -> None:
    print("\033[32m", text, "\033[0m", sep="")


def print_red(text: str) -> None:
    print("\033[31m", text, "\033[0m", sep="")


class MetricsWriter(Protocol):
    def add_scalar(self, tag: str, value: float, step: int) -> None: ...
    def close(self) -> None: ...


class NullWriter:
    def add_scalar(self, tag: str, value: float, step: int) -> None:
        pass

    def close(self) -> None:
        pass


class JsonlWriter:
    """Append-only JSONL scalar log: one {tag, value, step} per line."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        # line-buffered: a crash/hang-kill (the tunneled TPU dies in
        # several known ways, CLAUDE.md) must not lose the buffered tail
        self._f = open(path, "a", buffering=1)

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")

    def close(self) -> None:
        self._f.close()


class TeeWriter:
    def __init__(self, *writers: MetricsWriter):
        self._writers = writers

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        for w in self._writers:
            w.add_scalar(tag, value, step)

    def close(self) -> None:
        for w in self._writers:
            w.close()


def make_metrics_writer(log_dir: Optional[str], tensorboard: bool = True) -> MetricsWriter:
    """TensorBoard (into ``<log_dir>/runs`` like the reference,
    trainers.py:138) + JSONL, degrading gracefully if TB is missing."""
    if log_dir is None:
        return NullWriter()
    writers = [JsonlWriter(os.path.join(log_dir, "metrics.jsonl"))]
    if tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writers.append(SummaryWriter(log_dir=os.path.join(log_dir, "runs")))
        except Exception:
            pass
    return TeeWriter(*writers) if len(writers) > 1 else writers[0]

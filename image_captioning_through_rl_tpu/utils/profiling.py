"""Tracing and step-timing (the observability layer the reference lacks).

The reference's only instrumentation is tqdm progress bars and a manual
GC tensor dump (SURVEY §5). Here:

  * :func:`trace` — context manager around ``jax.profiler`` producing a
    Perfetto/TensorBoard-loadable trace of device execution;
  * :class:`StepTimer` — cheap wall-clock meter for steady-state step
    time (synchronizes on the step output, skips warmup/compile steps);
  * :func:`annotate` — named trace regions for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace into ``log_dir`` (view in TensorBoard's
    profile plugin or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Steady-state step timing with compile-step exclusion.

    >>> timer = StepTimer(skip=2)
    >>> for batch in batches:
    ...     with timer:
    ...         out = step(...)
    ...         timer.sync(out)   # block on the step's output
    >>> timer.mean_ms, timer.p50_ms
    """

    def __init__(self, skip: int = 2):
        self._skip = skip
        self._seen = 0
        self.samples_ms: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def sync(self, out) -> None:
        # host readback, not block_until_ready: on tunneled backends
        # (axon) block_until_ready can return BEFORE device execution
        # completes, silently under-reporting step times (CLAUDE.md)
        import numpy as np

        np.asarray(jax.tree.leaves(out)[0])

    def __exit__(self, *exc):
        dt = (time.perf_counter() - self._t0) * 1e3
        self._seen += 1
        if self._seen > self._skip:
            self.samples_ms.append(dt)
        return False

    @property
    def mean_ms(self) -> float:
        return sum(self.samples_ms) / len(self.samples_ms) if self.samples_ms else 0.0

    @property
    def p50_ms(self) -> float:
        if not self.samples_ms:
            return 0.0
        s = sorted(self.samples_ms)
        return s[len(s) // 2]

    @property
    def steps_per_sec(self) -> float:
        return 1000.0 / self.mean_ms if self.mean_ms else 0.0

"""Verified dispatch: serve a fast kernel only after it proves itself.

Pallas kernels share XLA's rounding class only on trained (peaked)
weights — on near-tie-dominated weights no two lowerings agree token
for token (docs/DESIGN.md §7). So fast decode paths are never assumed
correct: the FIRST call runs both the kernel and the reference
implementation on the live inputs, and exact agreement locks the kernel
in for every later call, while a mismatch or an exception (no Mosaic
backend, lowering failure, shape guard) locks in the reference path.

One implementation shared by :class:`..api.Captioner` and
:func:`..train.loops.test_a2c_network` so the dispatch policy cannot
drift between the serving and eval surfaces.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional


class VerifiedDispatch:
    """Callable wrapping ``(fast_fn, ref_fn)`` behind a one-time canary.

    ``equal(fast_out, ref_out)`` decides the verdict on the first call;
    ``on_verdict(ok, exc)`` (optional) observes it — ``exc`` carries the
    exception when the fast path failed outright, else ``None``.
    ``verdict`` stays ``None`` until the canary has run. Thread-safe:
    concurrent first calls (e.g. a server warmup racing live traffic)
    serialize on the canary, so exactly one verdict is latched and
    ``on_verdict`` fires once.
    """

    def __init__(
        self,
        fast_fn: Callable,
        ref_fn: Callable,
        equal: Callable,
        on_verdict: Optional[Callable] = None,
    ):
        self._fast = fast_fn
        self._ref = ref_fn
        self._equal = equal
        self._on_verdict = on_verdict
        self._lock = threading.Lock()
        self.verdict: Optional[bool] = None

    def __call__(self, *args):
        if self.verdict is None:
            with self._lock:
                if self.verdict is None:  # double-checked: one canary
                    try:
                        fast_out = self._fast(*args)
                    except Exception as e:  # kernel unavailable: latch ref
                        self._resolve(False, e)
                        return self._ref(*args)
                    ref_out = self._ref(*args)
                    self._resolve(bool(self._equal(fast_out, ref_out)), None)
                    return fast_out if self.verdict else ref_out
        return self._fast(*args) if self.verdict else self._ref(*args)

    def _resolve(self, ok: bool, exc) -> None:
        self.verdict = ok
        if self._on_verdict is not None:
            self._on_verdict(ok, exc)

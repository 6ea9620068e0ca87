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

    ``retry_args(attempt, *args)`` (optional) enables *fresh-canary
    retries* for stochastic paths whose canary equality is a per-key
    coin flip rather than a kernel property (sampling: a top-2
    logit+Gumbel gap inside the ~1e-5 cross-compiler matmul noise flips
    one draw — bench.py measures this on real keys). A mismatch WITHOUT
    an exception re-runs the canary on ``retry_args(attempt, *args)``
    (e.g. the same batch under a folded-in fresh key) up to ``retries``
    more times; the first exact agreement locks the kernel IN, while a
    systematic kernel break still mismatches under every key and locks
    the reference path. Exceptions never retry — a lowering failure is
    deterministic. ``attempts`` records how many canaries ran.
    """

    def __init__(
        self,
        fast_fn: Callable,
        ref_fn: Callable,
        equal: Callable,
        on_verdict: Optional[Callable] = None,
        retry_args: Optional[Callable] = None,
        retries: int = 2,
    ):
        self._fast = fast_fn
        self._ref = ref_fn
        self._equal = equal
        self._on_verdict = on_verdict
        self._retry_args = retry_args
        self._retries = retries if retry_args is not None else 0
        self._lock = threading.Lock()
        self.verdict: Optional[bool] = None
        self.attempts: int = 0

    def __call__(self, *args):
        if self.verdict is None:
            with self._lock:
                if self.verdict is None:  # double-checked: one canary
                    return self._canary(args)
        return self._fast(*args) if self.verdict else self._ref(*args)

    def _canary(self, args):
        self.attempts = 1
        try:
            fast_out = self._fast(*args)
        except Exception as e:  # kernel unavailable: latch ref
            self._resolve(False, e)
            return self._ref(*args)
        ref_out = self._ref(*args)
        ok = bool(self._equal(fast_out, ref_out))
        for attempt in range(1, self._retries + 1):
            if ok:
                break
            rargs = self._retry_args(attempt, *args)
            self.attempts += 1
            try:
                ok = bool(self._equal(self._fast(*rargs), self._ref(*rargs)))
            except Exception as e:  # broke on the retry key: latch ref
                self._resolve(False, e)
                return ref_out
        self._resolve(ok, None)
        # verdict True serves the FAST output even when the live key was
        # the one that flipped: later identical calls ride the latched
        # kernel, so same-seed determinism requires the kernel's draw now
        return fast_out if ok else ref_out

    def _resolve(self, ok: bool, exc) -> None:
        self.verdict = ok
        if self._on_verdict is not None:
            self._on_verdict(ok, exc)

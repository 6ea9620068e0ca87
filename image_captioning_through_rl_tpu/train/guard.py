"""Failure detection: non-finite-loss training guard.

The reference has no failure detection (SURVEY §5 — its only
try/excepts cover dtype fallback and missing files): one NaN/Inf loss
(LR spike, bad batch, numerics bug) silently poisons Adam's moments and
every later update, and the run burns its remaining epochs writing NaN
weights and useless dumps. In this framework every trainer already
reads each minibatch loss back to the host (best-loss bookkeeping and
TB scalars), so divergence detection costs NOTHING on device: this
module turns the first non-finite loss into a hard, diagnosable
:class:`TrainingDiverged` error, after dumping the implicated weights
next to the trainer's checkpoint for post-mortem.

Escape hatch: ``ICRL_NO_NAN_GUARD=1`` restores the reference's
keep-going behavior (e.g. to reproduce a reference run that itself
diverged).
"""

from __future__ import annotations

import math
import os
from typing import Optional

_ENV_DISABLE = "ICRL_NO_NAN_GUARD"


class TrainingDiverged(RuntimeError):
    """Raised when a trainer produces a non-finite loss."""


def guard_enabled() -> bool:
    # "0"/""/unset keep the guard armed — only an affirmative value
    # disables it (a wrapper exporting ICRL_NO_NAN_GUARD=0 must not
    # silently turn the guard OFF).
    return os.environ.get(_ENV_DISABLE, "0").lower() in ("", "0", "false", "no")


def check_finite(
    loss: float,
    what: str,
    where: str,
    dump_tree=None,
    dump_path: Optional[str] = None,
) -> None:
    """Raise :class:`TrainingDiverged` if ``loss`` is NaN/Inf.

    ``loss`` must already be a host float (every call site reads it
    back anyway) — this function never forces a device sync.
    ``dump_tree``/``dump_path`` optionally save the implicated weights
    (entering weights where the caller has them, else the current
    post-update tree) for post-mortem before raising.
    """
    if math.isfinite(loss):
        return
    if not guard_enabled():
        return
    msg = (f"{what} loss became {loss} at {where} — training halted "
           f"(the reference would keep going: a non-finite loss poisons "
           f"the Adam moments and every later update)")
    if dump_tree is not None and dump_path:
        from . import checkpoint as ckpt

        try:
            ckpt.save_pytree(dump_tree, dump_path)
            msg += f"; implicated weights dumped to {dump_path}"
        except Exception as e:  # the dump must never mask the diagnosis
            msg += f"; weight dump to {dump_path} failed ({e!r})"
    msg += (". Resume from the last saved checkpoint, or set "
            f"{_ENV_DISABLE}=1 to disable this guard.")
    raise TrainingDiverged(msg)

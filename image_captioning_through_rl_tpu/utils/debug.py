"""Debug helpers.

TPU-native counterpart of the reference's GC tensor dump
(``print_garbage_collection``, utilities.py:215-226): enumerate the
device buffers JAX currently holds live, with shapes, dtypes, sharding
and total bytes — the first tool to reach for on an HBM OOM.
"""

from __future__ import annotations

import jax


def live_array_report(limit: int = 100) -> str:
    """Summarize live device arrays (largest first)."""
    arrays = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)
    total = sum(a.nbytes for a in arrays)
    lines = [f"live device arrays: {len(arrays)}, total {total / 1e6:.1f} MB"]
    for a in arrays[:limit]:
        try:
            sharding = str(a.sharding)
        except Exception:
            sharding = "?"
        lines.append(f"  {a.shape} {a.dtype} {a.nbytes / 1e6:.2f} MB  {sharding}")
    if len(arrays) > limit:
        lines.append(f"  ... and {len(arrays) - limit} more")
    return "\n".join(lines)


def print_live_arrays(limit: int = 100) -> None:
    print("-" * 30)
    print(live_array_report(limit))
    print("-" * 30)

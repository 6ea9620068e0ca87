"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def maybe_init_distributed() -> bool:
    """Join a multi-host SPMD job when launch env vars announce one.

    Single-host runs (this environment) are a no-op. On a multi-host TPU
    slice the launcher (GKE/Cloud TPU/manual) exports coordinator
    information; ``jax.distributed.initialize()`` auto-discovers it on
    Cloud TPU, and ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID`` drive the manual form. After initialization,
    ``jax.devices()`` spans the whole slice, the same jitted programs
    partition across it (DESIGN.md §6), and :func:`is_main_process`
    gates host I/O. Returns True when a multi-process runtime came up.
    """
    import os

    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_count() > 1
    env = {
        k: os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
    }
    present = [k for k, v in env.items() if v]
    if present and len(present) < len(env):
        # a partially-announced job must fail loudly HERE: silently
        # falling back to single-host would leave the peer processes
        # blocked at the coordinator forever, with no diagnostic
        missing = sorted(set(env) - set(present))
        raise RuntimeError(
            f"multi-host launch env is incomplete: {sorted(present)} set "
            f"but {missing} missing — export all three or none"
        )
    if present:
        jax.distributed.initialize(
            coordinator_address=env["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(env["JAX_NUM_PROCESSES"]),
            process_id=int(env["JAX_PROCESS_ID"]),
        )
        return jax.process_count() > 1
    if os.environ.get("JAX_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # Cloud TPU metadata auto-discovery
        return jax.process_count() > 1
    return False


def is_main_process() -> bool:
    """True on the host that should perform file I/O (checkpoint writes,
    caption dumps, metric logs). Multi-host SPMD runs one process per
    host; only process 0 touches the filesystem."""
    return jax.process_index() == 0


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``make_mesh()`` -> 1-D ``data`` mesh over all devices.
    ``make_mesh((4, 2), ("data", "model"))`` -> 2-D mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} does not cover {len(devices)} devices")
    if len(shape) != len(axis_names):
        raise ValueError("shape and axis_names must have the same rank")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)

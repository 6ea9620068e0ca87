"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


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

"""Per-process global-batch construction for multi-host SPMD training.

The reference has no distributed code at all (SURVEY §2); the tpu-native
scaling model is one Python process per host, all hosts executing the
same jitted SPMD program over one global :class:`~jax.sharding.Mesh`
(DESIGN.md §6). The piece that makes a *training loop* multi-host-real
is input placement: every process draws the SAME host-RNG stream (same
seed → same epoch permutation → same global minibatch), but only
uploads the rows its addressable devices own, assembling a global
``jax.Array`` with :func:`jax.make_array_from_process_local_data`.
Everything downstream — loss ``mean`` → cross-host ``psum``, gradient
all-reduce — is inserted by the GSPMD partitioner over ICI/DCN; the
loop code is the single-host loop.

Single-process meshes take the same path (the "local block" is the
whole batch), so the suite exercises this module on the 8-virtual-
device CPU mesh while ``tests/test_multihost.py`` proves the genuine
2-process form against a localhost ``jax.distributed`` coordinator.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class GlobalBatcher:
    """Builds global device arrays from host data, uploading only the
    current process's shard.

    ``shard(*arrays)`` commits host batches to a ``data``-sharded layout
    (batch axis 0); ragged batches that don't divide the data-axis size
    fall back to replication (mirroring
    :meth:`..data.device.DeviceCocoTables.gather`). ``replicate(tree)``
    commits parameter/optimizer pytrees to the fully-replicated layout —
    every process holds identical values (same init PRNG key), so each
    contributes its local copy.
    """

    def __init__(self, mesh: Mesh, axis: str = "data"):
        self.mesh = mesh
        self.axis = axis
        self._replicated = NamedSharding(mesh, P())

    @property
    def _data_size(self) -> int:
        # lazy: replicate() is axis-agnostic and must work on meshes
        # that don't carry the data axis at all
        return int(self.mesh.shape[self.axis])

    def _row_sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis, *([None] * (ndim - 1))))

    def local_rows(self, sharding: NamedSharding, global_shape,
                   axis: int = 0) -> Tuple[int, int]:
        """This process's contiguous ``[lo, hi)`` block of dimension
        ``axis`` of a batch with ``global_shape`` under ``sharding``.

        Meshes built over ``jax.devices()`` enumerate devices
        process-major, so each process's shards form one contiguous
        block; assert that rather than assume it.
        """
        idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
        # dedupe: on a 2-D (data, model) mesh, devices along the model
        # axis hold the SAME row slice — counting each device would
        # double the total and fail the contiguity check below
        spans = set()
        for idx in idx_map.values():
            sl = idx[axis]
            lo = sl.start or 0
            hi = sl.stop if sl.stop is not None else global_shape[axis]
            spans.add((lo, hi))
        starts = sorted(lo for lo, _ in spans)
        stops = sorted(hi for _, hi in spans)
        total = sum(hi - lo for lo, hi in spans)
        lo, hi = starts[0], stops[-1]
        if hi - lo != total or any(a != b for a, b in zip(stops[:-1], starts[1:])):
            raise ValueError(
                "process-local shards are not contiguous under this mesh; "
                "build the mesh over jax.devices() in default order"
            )
        return lo, hi

    def shard(self, *arrays, batch_axis: int = 0):
        """Commit host arrays (full global batch on every process) to the
        batch-sharded layout, uploading only the local row block."""
        out = []
        for a in arrays:
            a = np.asarray(a)
            if batch_axis != 0:
                raise ValueError("GlobalBatcher shards batch axis 0")
            if a.shape[0] % self._data_size != 0:
                # ragged tail: replicate (a sharded layout needs divisibility)
                out.append(
                    jax.make_array_from_process_local_data(
                        self._replicated, a, a.shape
                    )
                )
                continue
            sharding = self._row_sharding(a.ndim)
            lo, hi = self.local_rows(sharding, a.shape)
            out.append(
                jax.make_array_from_process_local_data(sharding, a[lo:hi], a.shape)
            )
        return tuple(out) if len(out) > 1 else out[0]

    def shard_stacked(self, *arrays):
        """Commit ``[k, N, ...]`` chunk inputs: sharded on axis 1 (the
        batch), replicated on the chunk axis."""
        out = []
        for a in arrays:
            a = np.asarray(a)
            if a.shape[1] % self._data_size != 0:
                out.append(
                    jax.make_array_from_process_local_data(
                        self._replicated, a, a.shape
                    )
                )
                continue
            sharding = NamedSharding(
                self.mesh, P(None, self.axis, *([None] * (a.ndim - 2)))
            )
            lo, hi = self.local_rows(sharding, a.shape, axis=1)
            out.append(
                jax.make_array_from_process_local_data(
                    sharding, a[:, lo:hi], a.shape
                )
            )
        return tuple(out) if len(out) > 1 else out[0]

    def replicate(self, tree):
        """Commit a pytree to the fully-replicated global layout."""
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                self._replicated, np.asarray(x), np.shape(x)
            ),
            tree,
        )

"""Device-resident dataset tables with on-chip minibatch gathers.

The whole COCO-PCA bundle is small by HBM standards (~80k x 512 f32
train features ≈ 160 MB; captions ≈ 14 MB int32), so instead of
gathering minibatches on the host and shipping them every step (the
reference's pattern, and the host-side iterators in :mod:`.coco`), the
tables live in device HBM and each step ships only the index vector —
the per-caption feature gather (``image_idxs`` indirection,
utilities.py:174-176) becomes one on-chip ``take``.

Under a data mesh the gathered batch is committed to a batch-sharded
layout so downstream steps partition automatically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .coco import CocoData


@jax.jit
def _gather(captions, features, image_idxs, mask):
    caps_b = jnp.take(captions, mask, axis=0)
    feats_b = jnp.take(features, jnp.take(image_idxs, mask), axis=0)
    return caps_b, feats_b


class _MinibatchMixin:
    """Shared epoch iterator mirroring
    :func:`..data.coco.get_coco_minibatches` (one permutation per epoch);
    the subclass supplies ``gather``/``num_captions``. Shared so the
    single-process (device-tables) and multi-host (host-tables) loops
    consume IDENTICAL index streams — the mesh-vs-plain equivalence
    tests depend on it."""

    def minibatches(
        self, batch_size: int, rng: Optional[np.random.Generator] = None,
        drop_remainder: bool = False,
    ):
        from .coco import epoch_minibatch_indices

        for mask in epoch_minibatch_indices(
            self.num_captions, batch_size, rng, drop_remainder
        ):
            yield self.gather(mask)


class DeviceCocoTables(_MinibatchMixin):
    """HBM-resident caption/feature tables for one split."""

    def __init__(self, data: CocoData, split: str = "train", mesh=None, data_axis: str = "data"):
        caps, idxs, feats, _ = data.split(split)
        self._mesh = mesh
        self._data_axis = data_axis
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self.captions = jax.device_put(jnp.asarray(caps), rep)
            self.features = jax.device_put(jnp.asarray(feats), rep)
            self.image_idxs = jax.device_put(jnp.asarray(idxs), rep)
        else:
            self.captions = jnp.asarray(caps)
            self.features = jnp.asarray(feats)
            self.image_idxs = jnp.asarray(idxs)
        self.num_captions = int(caps.shape[0])

    def gather(self, mask: np.ndarray) -> Tuple[jax.Array, jax.Array]:
        """On-chip minibatch gather; only ``mask`` crosses PCIe/DCN.

        Under a mesh the gathered batch commits to a data-sharded
        layout; batches not divisible by the data-axis size (e.g. a
        ragged epoch tail) are replicated instead — a sharded layout
        requires divisibility, and replication keeps the step correct
        (the partitioner re-shards what it can).
        """
        idx = jnp.asarray(mask.astype(np.int32))
        caps_b, feats_b = _gather(self.captions, self.features, self.image_idxs, idx)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # a mesh without the data axis (e.g. model-only) still
            # works: fall back to the replicated layout it would get
            # from the ragged-tail branch anyway
            data = self._mesh.shape.get(self._data_axis, 0)
            spec = P(self._data_axis) if data and caps_b.shape[0] % data == 0 else P()
            batch_sharding = NamedSharding(self._mesh, spec)
            caps_b = jax.device_put(caps_b, batch_sharding)
            feats_b = jax.device_put(feats_b, batch_sharding)
        return caps_b, feats_b


class HostCocoTables(_MinibatchMixin):
    """Host-memory twin of :class:`DeviceCocoTables` for multi-host loops.

    On a multi-process mesh, ``jax.device_put`` cannot commit host data
    to non-addressable devices, so the dataset stays in host memory and
    gathers stay numpy; the training loops then upload only each
    process's shard of a minibatch through
    :class:`..parallel.hostbatch.GlobalBatcher`. Same ``num_captions`` /
    ``gather`` / ``minibatches`` interface as the device tables.
    """

    def __init__(self, data: CocoData, split: str = "train"):
        caps, idxs, feats, _ = data.split(split)
        self.captions = np.asarray(caps)
        self.image_idxs = np.asarray(idxs)
        self.features = np.asarray(feats)
        self.num_captions = int(caps.shape[0])

    def gather(self, mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        caps_b = self.captions[mask]
        feats_b = self.features[self.image_idxs[mask]]
        return caps_b, feats_b

"""PCA projection for visual features.

The CS231n bundle ships both raw 4096-d fc7 features and a 512-d PCA
variant (``*_vgg16_fc7_pca.h5``, reference utilities.py:61-64). This
module reproduces that reduction: fit on a feature table (on-device SVD)
and apply as a single matmul — so a user can regenerate the compact
features from raw images via :mod:`..models.vgg`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PCAProjection:
    mean: jax.Array  # [D]
    components: jax.Array  # [D, k]

    def apply(self, feats: jax.Array) -> jax.Array:
        return (feats - self.mean) @ self.components

    def save(self, path: str) -> None:
        # np.savez would append '.npz' itself for bare paths; make that
        # explicit so save/load stay symmetric, and publish atomically
        # (a crash mid-save must not leave a truncated npz behind)
        from ..utils.io import atomic_write

        if not path.endswith(".npz"):
            path += ".npz"
        with atomic_write(path) as f:
            np.savez(f, mean=np.asarray(self.mean),
                     components=np.asarray(self.components))

    @staticmethod
    def load(path: str) -> "PCAProjection":
        import os

        if not path.endswith(".npz") and not os.path.exists(path):
            # mirror save()'s (and np.savez's) extension appending so the
            # documented save(p) -> load(p) round trip holds for bare paths
            path += ".npz"
        z = np.load(path)
        return PCAProjection(jnp.asarray(z["mean"]), jnp.asarray(z["components"]))


def fit_pca(features: jax.Array, k: int = 512) -> PCAProjection:
    """Principal components of a feature table ``[N, D] -> [D, k]``."""
    x = jnp.asarray(features, jnp.float32)
    n, d = x.shape
    if k > min(n, d):
        # svd(full_matrices=False) yields only min(N, D) components;
        # silently returning fewer would write a feature table whose
        # dimension surprises every downstream consumer
        raise ValueError(
            f"cannot fit {k} principal components from {n} samples of "
            f"dim {d}; need at least k samples"
        )
    mean = jnp.mean(x, axis=0)
    _, _, vt = jnp.linalg.svd(x - mean, full_matrices=False)
    return PCAProjection(mean=mean, components=vt[:k].T)

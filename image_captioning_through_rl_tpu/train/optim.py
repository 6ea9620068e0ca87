"""Optimizers.

Adam with torch-default hyperparameters (beta1=0.9, beta2=0.999,
eps=1e-8 — the reference uses ``optim.Adam`` defaults at four learning
rates, trainers.py:155,218,275,378). optax's ``scale_by_adam`` applies
eps outside the sqrt exactly like torch, so update math matches.

When pretrained word embeddings are used the reference freezes the
embedding tables (``nn.Embedding.from_pretrained(freeze=True)``,
models.py:62); here freezing is an optax mask that zeroes their updates.
"""

from __future__ import annotations

import jax
import optax


def _embedding_labels(params) -> dict:
    """Pytree of labels: "frozen" for embedding tables, "train" elsewhere."""

    def mark(path, leaf):
        frozen = any(getattr(p, "key", None) == "embedding" for p in path)
        return "frozen" if frozen else "train"

    return jax.tree_util.tree_map_with_path(mark, params)


def adam(lr: float, params=None, freeze_embeddings: bool = False):
    """Build the optimizer; pass ``params`` when freezing embeddings."""
    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if freeze_embeddings:
        if params is None:
            raise ValueError("freeze_embeddings requires params to build the labels")
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, _embedding_labels(params)
        )
    return tx

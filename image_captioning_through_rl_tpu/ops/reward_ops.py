"""Embedding-reward scoring."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cosine_embedding_reward(
    visual_embeds: jax.Array,
    semantic_embeds: jax.Array,
    eps: float = 1e-12,
) -> jax.Array:
    """Cosine similarity between L2-normalized embedding pairs.

    The learned reward of the paper: ``r = cos(ve, se)`` per sample
    (reference trainers.py:108-121). ``[N, D] x [N, D] -> [N]``.

    ``eps`` matches torch ``F.normalize``'s clamp so zero vectors do not
    produce NaNs.
    """

    def normalize(x):
        norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
        return x / norm

    return jnp.sum(normalize(visual_embeds) * normalize(semantic_embeds), axis=-1)

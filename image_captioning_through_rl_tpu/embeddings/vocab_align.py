"""Align trained embedding vectors to the caption vocabulary
(reference utilities.py:418-441)."""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def get_vectors_by_vocab(model: Mapping[str, np.ndarray], word_to_idx: Dict[str, int]) -> np.ndarray:
    """Gather a ``[vocab, dim]`` matrix for ``word_to_idx`` from a
    word->vector mapping. OOV words get a random vector if nothing has
    been seen yet, otherwise the running mean of seen vectors (the
    reference's fallback, utilities.py:429-439)."""
    if hasattr(model, "values"):
        if not model:
            raise ValueError(
                "cannot align an empty embedding model (no vectors — "
                "empty corpus or truncated vectors file?)"
            )
        dim = len(next(iter(model.values())))
    else:
        dim = model.vector_size
    idx_to_word = {i: w for w, i in word_to_idx.items()}
    out = np.empty((len(idx_to_word), dim), dtype=np.float32)
    seen = []
    mean_at = -1  # len(seen) the cached mean was computed at
    mean = None
    for idx in range(len(idx_to_word)):
        word = idx_to_word[idx]
        try:
            vec = np.asarray(model[word], dtype=np.float32)
            out[idx] = vec
            seen.append(vec)
        except KeyError:
            if not seen:
                out[idx] = np.random.rand(dim).astype(np.float32)
            else:
                # recompute only when `seen` grew — same np.mean call as
                # the reference (bit-identical values), without the
                # O(V^2 * D) rebuild per consecutive OOV word
                if mean_at != len(seen):
                    mean = np.mean(np.asarray(seen), axis=0)
                    mean_at = len(seen)
                out[idx] = mean
    return out

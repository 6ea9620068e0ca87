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
    idx_to_word = {i: w for w, i in word_to_idx.items()}
    dim = len(next(iter(model.values()))) if hasattr(model, "values") else model.vector_size
    out = np.empty((len(idx_to_word), dim), dtype=np.float32)
    seen = []
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
                out[idx] = np.mean(np.asarray(seen), axis=0)
    return out

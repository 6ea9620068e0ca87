"""Pretrained embedding loaders (gensim-gated).

The reference maps short names to gensim-downloader models
(utilities.py:375-397). gensim is an optional dependency here; when it
is absent these raise a clear error instead of failing deep inside.
"""

from __future__ import annotations

import os

_NAME_MAP = {
    "conceptnet": "conceptnet-numberbatch-17-06-300",
    "fasttext": "fasttext-wiki-news-subwords-300",
    "word2vec": "word2vec-google-news-300",
    "glove": "glove-wiki-gigaword-300",
}


def get_embeddings(emb_type: str):
    """Load a standard pretrained embedding model by short name or path."""
    if os.path.isfile(emb_type):
        return get_embedding_model(emb_type)
    name = _NAME_MAP.get(emb_type)
    if name is None:
        raise ValueError(f"unknown embedding type {emb_type!r}; expected one of "
                         f"{sorted(_NAME_MAP)} or a file path")
    try:
        import gensim.downloader as api
    except ImportError as e:
        raise ImportError(
            "loading pretrained gensim models requires gensim; train embeddings "
            "natively instead with --train_word2vec word2vec|fasttext"
        ) from e
    return api.load(name)


def get_embedding_model(path):
    """Normalize KeyedVectors / model / word2vec-format path -> mapping."""
    if isinstance(path, dict):
        return path
    if hasattr(path, "wv"):
        return path.wv
    if hasattr(path, "key_to_index") or hasattr(path, "vocab"):
        return path
    if isinstance(path, str) and os.path.isfile(path):
        try:
            from gensim.models import KeyedVectors
        except ImportError as e:
            raise ImportError("loading word2vec-format files requires gensim") from e
        return KeyedVectors.load_word2vec_format(path)
    raise ValueError(
        f"Got {type(path)}; expected a path to embeddings or an embedding model"
    )

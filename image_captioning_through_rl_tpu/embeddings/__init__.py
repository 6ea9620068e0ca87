"""Word embeddings: TPU-native training + vocabulary alignment.

The reference trains Word2Vec/FastText through gensim on 56 CPU threads
(utilities.py:444-468). Here skip-gram with negative sampling runs as a
jitted JAX step — embedding gathers, the SGNS objective and the negative
sampling all on-chip — with a FastText-style subword-hashing variant.
Pretrained gensim-downloader models (utilities.py:375-397) are gated on
gensim availability.
"""

from .corpus import get_preprocessed_corpus, simple_preprocess
from .word2vec import train_word_embeddings
from .vocab_align import get_vectors_by_vocab
from .pretrained import (
    get_embedding_model,
    get_embeddings,
    load_word2vec_format,
    save_word2vec_format,
)

__all__ = [
    "get_preprocessed_corpus",
    "simple_preprocess",
    "train_word_embeddings",
    "get_vectors_by_vocab",
    "get_embeddings",
    "get_embedding_model",
    "load_word2vec_format",
    "save_word2vec_format",
]

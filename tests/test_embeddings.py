"""Word-embedding training: corpus prep, SGNS learning signal, alignment."""

import numpy as np

from image_captioning_through_rl_tpu.embeddings import (
    get_vectors_by_vocab,
    simple_preprocess,
)
from image_captioning_through_rl_tpu.embeddings.word2vec import train_sgns


def test_simple_preprocess():
    assert simple_preprocess("A man, riding! a BIG-horse 7x") == [
        "man", "riding", "big", "horse"
    ]
    assert simple_preprocess("i a x") == []  # length-1 tokens dropped


def _toy_corpus(n=300):
    # two tight topic clusters: (cat, meow, purr) and (dog, bark, fetch)
    rng = np.random.default_rng(0)
    corpus = []
    for _ in range(n):
        if rng.random() < 0.5:
            corpus.append(["cat", "meow", "purr", "cat", "meow"])
        else:
            corpus.append(["dog", "bark", "fetch", "dog", "bark"])
    return corpus


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def test_sgns_learns_topic_structure():
    model = train_sgns(_toy_corpus(), size=16, epochs=40, batch_size=1024, seed=1)
    within = _cos(model["cat"], model["meow"])
    across = _cos(model["cat"], model["bark"])
    assert within > across, (within, across)


def test_fasttext_subwords_run():
    model = train_sgns(_toy_corpus(60), size=8, epochs=3, batch_size=512,
                       subwords=True, num_buckets=1024, seed=2)
    assert model["cat"].shape == (8,)
    assert np.isfinite(model["cat"]).all()


def test_get_vectors_by_vocab_oov_fallbacks():
    model = {"cat": np.ones(4, np.float32), "dog": 2 * np.ones(4, np.float32)}
    word_to_idx = {"cat": 0, "dog": 1, "unseen": 2}
    vecs = get_vectors_by_vocab(model, word_to_idx)
    assert vecs.shape == (3, 4)
    np.testing.assert_array_equal(vecs[0], 1.0)
    np.testing.assert_array_equal(vecs[2], 1.5)  # mean of seen vectors

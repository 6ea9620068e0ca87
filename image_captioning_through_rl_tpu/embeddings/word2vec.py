"""Skip-gram-with-negative-sampling word embeddings, trained on-device.

TPU-native counterpart of the reference's gensim training
(utilities.py:444-468, skip-gram, size=300, min_count=1, 30 epochs):
(center, context) pairs are mined host-side once; every optimization
step is one jitted XLA program — embedding gathers, the SGNS logistic
objective, on-chip unigram^0.75 negative sampling, SGD update — over a
large pair batch, instead of gensim's per-word C loops across 56
threads.

``embedding_type="fasttext"`` adds FastText-style subword hash n-grams
(3..6 chars, FNV-1a into a bucket table); a word's input vector is the
mean of its word vector and its n-gram bucket vectors.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import print_green
from .vocab_align import get_vectors_by_vocab

_FNV_OFFSET = 2166136261
_FNV_PRIME = 16777619


def _fnv1a(s: str) -> int:
    # plain Python ints with an explicit 32-bit wrap: same FNV-1a values
    # as uint32 arithmetic, without numpy's per-byte overflow warnings
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & 0xFFFFFFFF
    return h


def _char_ngrams(word: str, min_n: int = 3, max_n: int = 6) -> List[str]:
    w = f"<{word}>"
    return [w[i : i + n] for n in range(min_n, max_n + 1) for i in range(len(w) - n + 1)]


def build_vocab(corpus: Sequence[Sequence[str]], min_count: int = 1):
    counts: Dict[str, int] = {}
    for sent in corpus:
        for w in sent:
            counts[w] = counts.get(w, 0) + 1
    words = sorted(w for w, c in counts.items() if c >= min_count)
    word_to_id = {w: i for i, w in enumerate(words)}
    freqs = np.asarray([counts[w] for w in words], dtype=np.float64)
    return word_to_id, freqs


def _mine_pairs(
    corpus: Sequence[Sequence[str]],
    word_to_id: Dict[str, int],
    window: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """All (center, context) pairs with word2vec's random window shrink."""
    pairs = []
    for sent in corpus:
        ids = [word_to_id[w] for w in sent if w in word_to_id]
        for i, c in enumerate(ids):
            b = int(rng.integers(1, window + 1))
            for j in range(max(0, i - b), min(len(ids), i + b + 1)):
                if j != i:
                    pairs.append((c, ids[j]))
    if not pairs:
        return np.zeros((0, 2), dtype=np.int32)
    return np.asarray(pairs, dtype=np.int32)


def _make_sgns_step(num_negatives: int, use_subwords: bool, dense: bool = False):
    """SGNS optimization step.

    The default is a SPARSE update: the SGNS gradient is nonzero only on
    the rows the batch touched, but ``jax.grad`` of an embedding gather
    materializes a full dense table gradient and ``params - lr*grads``
    a full dense update — ~157 MB per step for the 131072x300 fastText
    bucket table alone. The closed-form per-row gradients
    (``sigmoid(score)-label`` times the paired vectors) scatter-add onto
    only the gathered rows instead. ``dense=True`` keeps the autodiff
    form as the parity oracle (tests assert the two steps match).
    """
    def loss_fn(params, word_ngrams, ngram_wts, centers, contexts, neg_keys, noise_logits):
        if use_subwords:
            # center vec = mean of word vector and its n-gram bucket
            # vectors; ngram_wts masks the fixed-shape padding slots so
            # each real n-gram counts exactly once
            sub = jnp.sum(
                params["buckets"][word_ngrams[centers]]
                * ngram_wts[centers][:, :, None],
                axis=1,
            )
            v_c = (params["in"][centers] + sub) / 2.0
        else:
            v_c = params["in"][centers]  # [B, D]
        u_pos = params["out"][contexts]  # [B, D]
        negs = jax.random.categorical(
            neg_keys, noise_logits, shape=(centers.shape[0], num_negatives)
        )
        u_neg = params["out"][negs]  # [B, K, D]
        pos_score = jnp.sum(v_c * u_pos, axis=-1)
        neg_score = jnp.einsum("bd,bkd->bk", v_c, u_neg)
        loss = -jnp.mean(
            jax.nn.log_sigmoid(pos_score) + jnp.sum(jax.nn.log_sigmoid(-neg_score), axis=-1)
        )
        return loss

    @jax.jit
    def dense_step(params, word_ngrams, ngram_wts, lr, centers, contexts, key, noise_logits):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, word_ngrams, ngram_wts, centers, contexts, key, noise_logits
        )
        new = {k: params[k] - lr * grads[k] for k in params}
        return new, loss

    @jax.jit
    def sparse_step(params, word_ngrams, ngram_wts, lr, centers, contexts, key, noise_logits):
        b = centers.shape[0]
        if use_subwords:
            gram_ids = word_ngrams[centers]          # [B, G]
            gram_wts = ngram_wts[centers]            # [B, G]
            sub = jnp.sum(params["buckets"][gram_ids] * gram_wts[:, :, None], axis=1)
            v_c = (params["in"][centers] + sub) / 2.0
        else:
            v_c = params["in"][centers]
        u_pos = params["out"][contexts]
        negs = jax.random.categorical(
            key, noise_logits, shape=(b, num_negatives)
        )
        u_neg = params["out"][negs]
        pos_score = jnp.sum(v_c * u_pos, axis=-1)
        neg_score = jnp.einsum("bd,bkd->bk", v_c, u_neg)
        loss = -jnp.mean(
            jax.nn.log_sigmoid(pos_score) + jnp.sum(jax.nn.log_sigmoid(-neg_score), axis=-1)
        )
        # closed-form SGNS gradients, mean over the batch: d/dscore of
        # -log_sigmoid(pos) = sigmoid(pos)-1; of -log_sigmoid(-neg) =
        # sigmoid(neg). Duplicate ids accumulate via scatter-add, exactly
        # like the dense autodiff gradient.
        g_pos = (jax.nn.sigmoid(pos_score) - 1.0) / b              # [B]
        g_neg = jax.nn.sigmoid(neg_score) / b                       # [B, K]
        d_vc = g_pos[:, None] * u_pos + jnp.einsum("bk,bkd->bd", g_neg, u_neg)
        out = params["out"].at[contexts].add(-lr * g_pos[:, None] * v_c)
        out = out.at[negs.reshape(-1)].add(
            -lr * (g_neg[:, :, None] * v_c[:, None, :]).reshape(-1, v_c.shape[1])
        )
        new = {"out": out}
        if use_subwords:
            new["in"] = params["in"].at[centers].add(-lr * d_vc / 2.0)
            d_rows = (d_vc[:, None, :] / 2.0 * gram_wts[:, :, None]).reshape(
                -1, v_c.shape[1]
            )
            new["buckets"] = params["buckets"].at[gram_ids.reshape(-1)].add(
                -lr * d_rows
            )
        else:
            new["in"] = params["in"].at[centers].add(-lr * d_vc)
        return new, loss

    return dense_step if dense else sparse_step


def train_sgns(
    corpus: Sequence[Sequence[str]],
    size: int = 300,
    window: int = 5,
    min_count: int = 1,
    epochs: int = 30,
    num_negatives: int = 5,
    lr: float = 0.025,
    min_lr: float = 1e-4,
    batch_size: int = 65536,
    subwords: bool = False,
    num_buckets: int = 1 << 17,
    ngrams_per_word: int = 32,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Train SGNS embeddings; returns a word -> vector dict."""
    rng = np.random.default_rng(seed)
    word_to_id, freqs = build_vocab(corpus, min_count)
    vocab = len(word_to_id)
    if vocab == 0:
        return {}

    noise_logits = jnp.asarray(0.75 * np.log(freqs), dtype=jnp.float32)

    params = {
        "in": jnp.asarray(
            rng.uniform(-0.5 / size, 0.5 / size, (vocab, size)).astype(np.float32)
        ),
        "out": jnp.zeros((vocab, size), jnp.float32),
    }
    word_ngrams = jnp.zeros((1, 1), jnp.int32)  # placeholder when unused
    ngram_wts = jnp.zeros((1, 1), jnp.float32)
    if subwords:
        # fixed-shape [vocab, ngrams_per_word] bucket table with a
        # weight mask: real slots carry 1/n_real (a true mean over the
        # word's n-gram occurrences, fastText-style), padding slots 0.
        # Words with more n-grams than the cap keep the first
        # ngrams_per_word in _char_ngrams order (shortest grams first).
        grams = np.zeros((vocab, ngrams_per_word), dtype=np.int32)
        wts = np.zeros((vocab, ngrams_per_word), dtype=np.float32)
        for w, i in word_to_id.items():
            hs = [_fnv1a(g) % num_buckets for g in _char_ngrams(w)][:ngrams_per_word]
            if not hs:
                hs = [_fnv1a(w) % num_buckets]
            grams[i, : len(hs)] = hs
            wts[i, : len(hs)] = 1.0 / len(hs)
        word_ngrams = jnp.asarray(grams)
        ngram_wts = jnp.asarray(wts)
        params["buckets"] = jnp.asarray(
            rng.uniform(-0.5 / size, 0.5 / size, (num_buckets, size)).astype(np.float32)
        )

    pairs = _mine_pairs(corpus, word_to_id, window, rng)
    if pairs.shape[0] == 0:
        return {w: np.zeros(size, np.float32) for w in word_to_id}

    key = jax.random.PRNGKey(seed)
    step = _make_sgns_step(num_negatives, subwords)
    total_steps = max(1, epochs * ((pairs.shape[0] + batch_size - 1) // batch_size))
    step_no = 0
    for epoch in range(epochs):
        order = rng.permutation(pairs.shape[0])
        for lo in range(0, pairs.shape[0], batch_size):
            sel = order[lo : lo + batch_size]
            if sel.shape[0] < batch_size:  # pad to a single compiled shape
                sel = np.resize(sel, batch_size)
            cur_lr = max(min_lr, lr * (1.0 - step_no / total_steps))
            key, sub = jax.random.split(key)
            params, _ = step(
                params,
                word_ngrams,
                ngram_wts,
                jnp.float32(cur_lr),
                jnp.asarray(pairs[sel, 0]),
                jnp.asarray(pairs[sel, 1]),
                sub,
                noise_logits,
            )
            step_no += 1

    if subwords:
        sub = jnp.sum(params["buckets"][word_ngrams] * ngram_wts[:, :, None], axis=1)
        vecs = np.asarray((params["in"] + sub) / 2.0)
    else:
        vecs = np.asarray(params["in"])
    return {w: vecs[i] for w, i in word_to_id.items()}


def train_word_embeddings(
    embedding_type: str,
    target_data,
    train_corpus: Sequence[Sequence[str]],
    size: int = 300,
    epochs: int = 30,
    seed: int = 0,
    save_path: str = "",
) -> Optional[np.ndarray]:
    """Reference-compatible entry point (utilities.py:444-468): train
    ``word2vec`` or ``fasttext`` vectors on the caption corpus and align
    them to the dataset vocabulary. ``save_path`` additionally writes the
    raw (pre-alignment) model in the word2vec interchange format, so the
    trained vectors flow back into gensim/reference tooling."""
    if embedding_type == "none":
        return None
    print_green("[Info] Training Word Embeddings (JAX SGNS)")
    model = train_sgns(
        train_corpus, size=size, epochs=epochs,
        subwords=(embedding_type == "fasttext"), seed=seed,
    )
    print_green("[Info] Finished Training Word Embeddings")
    if save_path:
        from .pretrained import save_word2vec_format

        save_word2vec_format(
            model, save_path, binary=save_path.endswith((".bin", ".bin.gz")))
        print_green(f"[Info] Saved word embeddings to {save_path}")
    word_to_idx = target_data.word_to_idx if hasattr(target_data, "word_to_idx") else target_data["word_to_idx"]
    return get_vectors_by_vocab(model, word_to_idx)

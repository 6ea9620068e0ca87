"""Word-embedding training: corpus prep, SGNS learning signal, alignment."""

import pytest
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


def test_native_word2vec_format_loader_text_glove_binary(tmp_path):
    """File-path embeddings load without gensim: word2vec text (header),
    GloVe text (headerless) and word2vec binary, auto-detected."""
    import struct

    from image_captioning_through_rl_tpu.embeddings.pretrained import (
        get_embeddings,
        load_word2vec_format,
    )

    text = tmp_path / "vecs.vec"
    text.write_text("3 4\ncat 1 2 3 4\ndog 0.5 -1 2.25 0\nmat -1 -2 -3 -4\n")
    v = load_word2vec_format(str(text))
    assert len(v) == 3
    np.testing.assert_allclose(v["dog"], [0.5, -1, 2.25, 0])

    glove = tmp_path / "glove.txt"
    glove.write_text("cat 1 2 3 4\ndog 5 6 7 8\n")
    v = load_word2vec_format(str(glove))
    assert len(v) == 2
    np.testing.assert_allclose(v["dog"], [5, 6, 7, 8])

    binary = tmp_path / "vecs.bin"
    with open(binary, "wb") as f:
        f.write(b"2 3\n")
        f.write(b"cat " + struct.pack("<3f", 1.5, 2.5, 3.5) + b"\n")
        f.write(b"dog " + struct.pack("<3f", -1, 0, 1) + b"\n")
    v = load_word2vec_format(str(binary))  # binary auto-detected
    np.testing.assert_allclose(v["cat"], [1.5, 2.5, 3.5])

    # full path: get_embeddings(file) -> align to a vocab
    model = get_embeddings(str(text))
    vecs = get_vectors_by_vocab(model, {"cat": 0, "mat": 1, "oov": 2})
    assert vecs.shape == (3, 4)
    np.testing.assert_allclose(vecs[1], [-1, -2, -3, -4])


def test_native_loader_rejects_malformed_rows(tmp_path):
    from image_captioning_through_rl_tpu.embeddings.pretrained import load_word2vec_format

    bad = tmp_path / "bad.vec"
    bad.write_text("2 4\ncat 1 2 3 4\ndog 1 2\n")
    try:
        load_word2vec_format(str(bad))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "malformed" in str(e)


def test_simple_preprocess_keeps_accents_like_gensim_default():
    """gensim's simple_preprocess default is deacc=False: accented words
    survive so they align against the dataset vocab (the reference calls
    it with defaults, utilities.py:361-372)."""
    assert simple_preprocess("Café au lait") == ["café", "au", "lait"]
    assert simple_preprocess("Café au lait", deacc=True) == ["cafe", "au", "lait"]


def test_native_loader_detects_utf8_text_with_accents(tmp_path):
    """A UTF-8 .vec file with non-ASCII words in the sniff window must
    be parsed as text, not misclassified as binary garbage."""
    from image_captioning_through_rl_tpu.embeddings.pretrained import (
        load_word2vec_format,
    )

    p = tmp_path / "acc.vec"
    rows = ["3 4", "café 1 2 3 4", "naïve 5 6 7 8", "plain 9 10 11 12"]
    p.write_text("\n".join(rows) + "\n", encoding="utf-8")
    vecs = load_word2vec_format(str(p))
    assert set(vecs) == {"café", "naïve", "plain"}
    np.testing.assert_allclose(vecs["café"], [1, 2, 3, 4])


def test_native_loader_raises_on_truncated_binary(tmp_path):
    import struct

    import pytest

    from image_captioning_through_rl_tpu.embeddings.pretrained import (
        load_word2vec_format,
    )

    p = tmp_path / "trunc.bin"
    with open(p, "wb") as f:
        f.write(b"2 4\n")
        f.write(b"good " + struct.pack("<4f", 1, 2, 3, 4))
        f.write(b"cut " + struct.pack("<2f", 5, 6))  # half a vector
    with pytest.raises(ValueError, match="truncated"):
        load_word2vec_format(str(p), binary=True)


def test_named_model_resolves_from_local_cache(tmp_path, monkeypatch):
    """Short names (reference utilities.py:384-395) load offline from
    $ICRL_EMBEDDINGS_DIR through the native reader — gensim is only
    needed for live downloads."""
    from image_captioning_through_rl_tpu.embeddings.pretrained import get_embeddings

    cache = tmp_path / "emb_cache"
    cache.mkdir()
    (cache / "glove.txt").write_text("hello 1.0 2.0\nworld 3.0 4.0\n")
    monkeypatch.setenv("ICRL_EMBEDDINGS_DIR", str(cache))
    vecs = get_embeddings("glove")
    assert set(vecs) == {"hello", "world"}
    np.testing.assert_allclose(vecs["world"], [3.0, 4.0])

    # absent from cache + no gensim -> actionable error naming the cache
    import pytest as _pytest
    with _pytest.raises(ImportError, match="ICRL_EMBEDDINGS_DIR"):
        get_embeddings("word2vec")


def test_named_model_falls_back_to_gensim_downloader(tmp_path, monkeypatch):
    """When the local cache misses and gensim IS importable, short names
    resolve through gensim.downloader with the reference's exact
    short-name -> model-name map (utilities.py:384-395). gensim is absent
    in this environment, so inject a stub module: the point is the
    resolution contract (cache checked first, `api.load` called with the
    full mapped name, its return value passed through untouched)."""
    import sys
    import types

    from image_captioning_through_rl_tpu.embeddings.pretrained import get_embeddings

    monkeypatch.setenv("ICRL_EMBEDDINGS_DIR", str(tmp_path / "empty_cache"))
    loaded = []
    sentinel = {"hello": np.arange(3.0)}
    downloader = types.ModuleType("gensim.downloader")
    downloader.load = lambda name: loaded.append(name) or sentinel
    gensim_pkg = types.ModuleType("gensim")
    gensim_pkg.downloader = downloader
    monkeypatch.setitem(sys.modules, "gensim", gensim_pkg)
    monkeypatch.setitem(sys.modules, "gensim.downloader", downloader)

    assert get_embeddings("conceptnet") is sentinel
    assert loaded == ["conceptnet-numberbatch-17-06-300"]

    # a cache hit must win over the live download
    cache = tmp_path / "warm_cache"
    cache.mkdir()
    (cache / "glove.txt").write_text("hello 1.0 2.0\n")
    monkeypatch.setenv("ICRL_EMBEDDINGS_DIR", str(cache))
    vecs = get_embeddings("glove")
    assert set(vecs) == {"hello"}
    assert loaded == ["conceptnet-numberbatch-17-06-300"]  # no second load


@pytest.mark.slow
def test_sgns_sparse_step_matches_dense_autodiff():
    """The sparse scatter-update SGNS step (the default — dense autodiff
    materializes a full-table gradient, ~157 MB/step for the fastText
    bucket table) must produce the same parameters as the dense step,
    with and without subwords."""
    import jax
    import jax.numpy as jnp

    from image_captioning_through_rl_tpu.embeddings.word2vec import _make_sgns_step

    rng = np.random.default_rng(0)
    vocab, size, buckets, G, B, K = 12, 6, 16, 4, 32, 3
    noise_logits = jnp.asarray(rng.standard_normal(vocab).astype(np.float32))
    centers = jnp.asarray(rng.integers(0, vocab, B).astype(np.int32))
    contexts = jnp.asarray(rng.integers(0, vocab, B).astype(np.int32))
    key = jax.random.PRNGKey(3)
    word_ngrams = jnp.asarray(rng.integers(0, buckets, (vocab, G)).astype(np.int32))
    wts = rng.random((vocab, G)).astype(np.float32)
    wts[:, G // 2 :] = 0.0  # padding slots
    ngram_wts = jnp.asarray(wts)

    for subwords in (False, True):
        params = {
            "in": jnp.asarray(rng.standard_normal((vocab, size)).astype(np.float32)),
            "out": jnp.asarray(rng.standard_normal((vocab, size)).astype(np.float32)),
        }
        if subwords:
            params["buckets"] = jnp.asarray(
                rng.standard_normal((buckets, size)).astype(np.float32))
        dense = _make_sgns_step(K, subwords, dense=True)
        sparse = _make_sgns_step(K, subwords)
        pd, ld = dense(params, word_ngrams, ngram_wts, jnp.float32(0.1),
                       centers, contexts, key, noise_logits)
        ps, ls = sparse(params, word_ngrams, ngram_wts, jnp.float32(0.1),
                        centers, contexts, key, noise_logits)
        np.testing.assert_allclose(float(ld), float(ls), rtol=1e-6)
        for k in pd:
            np.testing.assert_allclose(np.asarray(pd[k]), np.asarray(ps[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)


def test_save_word2vec_format_roundtrip(tmp_path):
    """Writer -> native reader is value-exact in every layout (text,
    binary, gz), and the binary layout matches gensim's (word + space +
    raw little-endian f32s, no separator)."""
    from image_captioning_through_rl_tpu.embeddings import (
        load_word2vec_format,
        save_word2vec_format,
    )

    rng = np.random.default_rng(3)
    vecs = {w: rng.normal(size=7).astype(np.float32)
            for w in ["héllo", "world", "añio", "x"]}
    for name, binary in [("t.vec", False), ("b.bin", True),
                         ("t.vec.gz", False), ("b.bin.gz", True)]:
        p = str(tmp_path / name)
        save_word2vec_format(vecs, p, binary=binary)
        back = load_word2vec_format(p)
        assert sorted(back) == sorted(vecs)
        for w in vecs:
            np.testing.assert_array_equal(back[w], vecs[w])

    # gensim binary byte layout: header line, then word<space><payload>
    raw = open(str(tmp_path / "b.bin"), "rb").read()
    header, rest = raw.split(b"\n", 1)
    n, d = header.split()
    assert (int(n), int(d)) == (4, 7)
    first_word = list(vecs)[0].encode("utf-8")
    assert rest.startswith(first_word + b" ")
    payload = rest[len(first_word) + 1: len(first_word) + 1 + 28]
    np.testing.assert_array_equal(
        np.frombuffer(payload, dtype="<f4"), vecs[list(vecs)[0]])


def test_save_word2vec_format_validation(tmp_path):
    from image_captioning_through_rl_tpu.embeddings import save_word2vec_format

    with np.testing.assert_raises(ValueError):
        save_word2vec_format({}, str(tmp_path / "e.vec"))
    with np.testing.assert_raises(ValueError):
        save_word2vec_format(
            {"a": np.zeros(3, np.float32), "b": np.zeros(4, np.float32)},
            str(tmp_path / "m.vec"))
    assert not list(tmp_path.iterdir())  # atomic: no partial files left


def test_train_word_embeddings_save_path(tmp_path):
    """The save_path hook writes the raw pre-alignment model; its vectors
    match what alignment consumed."""
    from image_captioning_through_rl_tpu.embeddings import load_word2vec_format
    from image_captioning_through_rl_tpu.embeddings.word2vec import (
        train_word_embeddings,
    )

    corpus = [["cat", "dog", "cat"], ["dog", "bird", "cat"]] * 4
    data = {"word_to_idx": {"<NULL>": 0, "cat": 1, "dog": 2, "bird": 3}}
    p = str(tmp_path / "w.vec")
    aligned = train_word_embeddings("word2vec", data, corpus, size=8,
                                    epochs=1, save_path=p)
    model = load_word2vec_format(p)
    assert set(model) == {"cat", "dog", "bird"}
    np.testing.assert_allclose(model["cat"], aligned[1], rtol=1e-6)


def test_train_word_embeddings_save_path_bin_gz(tmp_path):
    """.bin.gz save paths write the BINARY layout (compressed), not text
    with a binary-looking name."""
    from image_captioning_through_rl_tpu.embeddings import load_word2vec_format
    from image_captioning_through_rl_tpu.embeddings.word2vec import (
        train_word_embeddings,
    )
    import gzip

    corpus = [["cat", "dog"], ["dog", "cat"]] * 4
    data = {"word_to_idx": {"<NULL>": 0, "cat": 1, "dog": 2}}
    p = str(tmp_path / "w.bin.gz")
    aligned = train_word_embeddings("word2vec", data, corpus, size=8,
                                    epochs=1, save_path=p)
    raw = gzip.open(p, "rb").read()
    header, rest = raw.split(b"\n", 1)
    n, d = (int(x) for x in header.split())
    # binary layout: word + space + 4*d raw bytes, no newline separator
    first = rest.split(b" ", 1)
    assert len(first[1]) >= 4 * d
    model = load_word2vec_format(p)  # autodetects binary
    np.testing.assert_allclose(model["cat"], aligned[1], rtol=1e-6)


def test_load_word2vec_binary_truncated_at_entry_boundary(tmp_path):
    """A binary file cut exactly at an entry boundary parses cleanly —
    the header count is the only witness, and the loader must use it."""
    from image_captioning_through_rl_tpu.embeddings import (
        load_word2vec_format,
        save_word2vec_format,
    )

    rng = np.random.default_rng(0)
    vecs = {f"w{i}": rng.normal(size=4).astype(np.float32) for i in range(5)}
    p = str(tmp_path / "v.bin")
    save_word2vec_format(vecs, p, binary=True)
    raw = open(p, "rb").read()
    header = raw.split(b"\n", 1)[0] + b"\n"
    entry = (len(raw) - len(header)) // 5
    cut = header + raw[len(header): len(header) + 2 * entry]  # 2 of 5 entries
    q = str(tmp_path / "cut.bin")
    open(q, "wb").write(cut)
    with np.testing.assert_raises_regex(ValueError, "declares 5"):
        load_word2vec_format(q, binary=True)


def test_load_word2vec_empty_file_diagnostic(tmp_path):
    from image_captioning_through_rl_tpu.embeddings import load_word2vec_format

    p = tmp_path / "empty.vec"
    p.write_bytes(b"")
    with np.testing.assert_raises_regex(ValueError, "empty"):
        load_word2vec_format(str(p))


def test_vocab_align_empty_model_raises():
    from image_captioning_through_rl_tpu.embeddings import get_vectors_by_vocab

    with np.testing.assert_raises_regex(ValueError, "empty embedding model"):
        get_vectors_by_vocab({}, {"a": 0})


def test_vocab_align_oov_mean_matches_naive():
    """The cached-mean OOV fallback is bit-identical to the reference's
    recompute-per-OOV-word form (utilities.py:429-439)."""
    from image_captioning_through_rl_tpu.embeddings import get_vectors_by_vocab

    rng = np.random.default_rng(7)
    model = {f"w{i}": rng.normal(size=5).astype(np.float32) for i in range(6)}
    # interleave found and OOV words so the mean changes between OOVs
    vocab = {}
    for i, w in enumerate(["w0", "x0", "w1", "x1", "x2", "w2", "x3"]):
        vocab[w] = i
    out = get_vectors_by_vocab(model, vocab)
    seen = []
    for w, i in vocab.items():
        if w in model:
            seen.append(model[w])
        else:
            np.testing.assert_array_equal(out[i], np.mean(np.asarray(seen), axis=0))


def test_named_model_resolves_bin_gz_from_cache(tmp_path, monkeypatch):
    """A .bin.gz drop-in (what save_word2vec_format itself writes for
    binary gz paths) must resolve from $ICRL_EMBEDDINGS_DIR."""
    from image_captioning_through_rl_tpu.embeddings import (
        get_embeddings,
        save_word2vec_format,
    )

    rng = np.random.default_rng(1)
    vecs = {"cat": rng.normal(size=3).astype(np.float32)}
    save_word2vec_format(vecs, str(tmp_path / "word2vec.bin.gz"), binary=True)
    monkeypatch.setenv("ICRL_EMBEDDINGS_DIR", str(tmp_path))
    model = get_embeddings("word2vec")
    np.testing.assert_array_equal(model["cat"], vecs["cat"])


def test_load_word2vec_duplicate_words_not_truncation(tmp_path):
    """A complete file with a duplicate word is valid (first occurrence
    wins, gensim's policy) — the header-count truncation check must
    count entries parsed, not dict size."""
    from image_captioning_through_rl_tpu.embeddings import load_word2vec_format

    # text with header: 3 declared entries, 'cat' twice
    p = tmp_path / "dup.vec"
    p.write_text("3 2\ncat 1.0 2.0\ndog 3.0 4.0\ncat 9.0 9.0\n")
    vecs = load_word2vec_format(str(p))
    assert sorted(vecs) == ["cat", "dog"]
    np.testing.assert_array_equal(vecs["cat"], [1.0, 2.0])  # first wins

    # binary: same duplicate, still loads
    payload = b"3 2\n"
    for w, v in [("cat", [1.0, 2.0]), ("dog", [3.0, 4.0]), ("cat", [9.0, 9.0])]:
        payload += w.encode() + b" " + np.asarray(v, "<f4").tobytes()
    q = tmp_path / "dup.bin"
    q.write_bytes(payload)
    vb = load_word2vec_format(str(q), binary=True)
    assert sorted(vb) == ["cat", "dog"]
    np.testing.assert_array_equal(vb["cat"], [1.0, 2.0])

"""Native C++ metric kernels: equality with the pure-Python scorers."""

import numpy as np
import pytest

from image_captioning_through_rl_tpu.metrics import cider, corpus_bleu
from image_captioning_through_rl_tpu.metrics.native import cider_native, corpus_bleu_native
from image_captioning_through_rl_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="C++ toolchain unavailable"
)


def _random_corpus(rng, n=50, vocab=40, multi_ref=False):
    words = [f"w{i}" for i in range(vocab)]

    def sent():
        ln = rng.integers(3, 15)
        return " ".join(words[i] for i in rng.integers(0, vocab, ln))

    refs = {i: [sent() for _ in range(rng.integers(1, 4) if multi_ref else 1)] for i in range(n)}
    hypos = {i: [sent()] for i in range(n)}
    return refs, hypos


def test_native_bleu_equals_python():
    rng = np.random.default_rng(0)
    refs, hypos = _random_corpus(rng)
    np.testing.assert_allclose(
        corpus_bleu_native(refs, hypos), corpus_bleu(refs, hypos), rtol=1e-12
    )


def test_native_bleu_multi_reference():
    rng = np.random.default_rng(1)
    refs, hypos = _random_corpus(rng, multi_ref=True)
    np.testing.assert_allclose(
        corpus_bleu_native(refs, hypos), corpus_bleu(refs, hypos), rtol=1e-12
    )


def test_native_cider_equals_python():
    rng = np.random.default_rng(2)
    refs, hypos = _random_corpus(rng)
    np.testing.assert_allclose(cider_native(refs, hypos), cider(refs, hypos), rtol=1e-12)


def test_native_cider_multi_reference():
    rng = np.random.default_rng(3)
    refs, hypos = _random_corpus(rng, multi_ref=True)
    np.testing.assert_allclose(cider_native(refs, hypos), cider(refs, hypos), rtol=1e-12)


def test_native_identical_sentences_score_one():
    refs = {0: ["a b c d e"], 1: ["f g h i j"]}
    b = corpus_bleu_native(refs, refs)
    np.testing.assert_allclose(b, [1.0] * 4, atol=1e-6)


def test_native_raises_on_empty_reference_group():
    """The C++ kernels would divide by nrefs=0 (CIDEr NaN) or feed
    best_len=-1 into BLEU's brevity penalty; the wrapper must raise like
    the pure-Python scorers instead of writing plausible garbage."""
    import pytest

    from image_captioning_through_rl_tpu.metrics.native import (
        cider_native,
        corpus_bleu_native,
    )

    refs = {0: ["a b c"], 1: []}
    hypos = {0: ["a b c"], 1: ["a b"]}
    for fn in (corpus_bleu_native, cider_native):
        with pytest.raises(ValueError, match="empty reference group"):
            fn(refs, hypos)


def _tie_heavy_corpus(rng, n=120):
    """Small vocab with shared-stem pairs and function words — maximizes
    alignment ties, the case where the native METEOR aligner must make
    the same tie-break choices as the Python DFS."""
    words = ["cat", "cats", "run", "running", "runs", "the", "a",
             "dog", "dogs", "jumped", "jump"]

    def sent():
        ln = int(rng.integers(1, 17))
        return " ".join(words[i] for i in rng.integers(0, len(words), ln))

    refs = {i: [sent() for _ in range(int(rng.integers(1, 4)))] for i in range(n)}
    hypos = {i: [sent()] for i in range(n)}
    return refs, hypos


def test_native_rouge_equals_python_per_sentence():
    from image_captioning_through_rl_tpu.metrics.native import rouge_scores_native
    from image_captioning_through_rl_tpu.metrics.rouge import rouge_l_sentence

    rng = np.random.default_rng(4)
    refs, hypos = _random_corpus(rng, multi_ref=True)
    native = rouge_scores_native(refs, hypos)
    for i in hypos:
        assert native[i] == rouge_l_sentence(hypos[i][0], refs[i])


def test_native_meteor_equals_python_per_sentence():
    """Bitwise per-sentence equality on a tie-heavy corpus: equal scores
    require the C++ DFS to pick the SAME alignment under (matches,
    chunks, weight) ties, since different pairs give different
    delta-weighted P/R masses."""
    from image_captioning_through_rl_tpu.metrics.meteor import meteor_sentence
    from image_captioning_through_rl_tpu.metrics.native import meteor_scores_native

    rng = np.random.default_rng(5)
    refs, hypos = _tie_heavy_corpus(rng)
    native = meteor_scores_native(refs, hypos)
    for i in hypos:
        assert native[i] == meteor_sentence(hypos[i][0], refs[i])


def test_native_meteor_rouge_corpus_dispatch():
    """The corpus-level entry points route through the native kernels
    (when built) and equal the pure-Python reductions."""
    from image_captioning_through_rl_tpu.metrics.meteor import meteor, meteor_sentence
    from image_captioning_through_rl_tpu.metrics.rouge import rouge_l, rouge_l_sentence

    rng = np.random.default_rng(6)
    refs, hypos = _tie_heavy_corpus(rng, n=40)
    pm = [meteor_sentence(hypos[i][0], refs[i]) for i in hypos]
    pr = [rouge_l_sentence(hypos[i][0], refs[i]) for i in hypos]
    assert meteor(refs, hypos) == sum(pm) / len(pm)
    assert rouge_l(refs, hypos) == sum(pr) / len(pr)


def test_native_meteor_empty_cases():
    """Empty hypothesis or empty reference group scores 0.0 (the Python
    meteor's skip semantics), while native ROUGE mirrors the Python
    max()-raise on an empty group."""
    from image_captioning_through_rl_tpu.metrics.native import (
        meteor_scores_native,
        rouge_scores_native,
    )

    refs = {0: ["a cat"], 1: []}
    hypos = {0: [""], 1: ["a cat"]}
    assert meteor_scores_native(refs, hypos) == [0.0, 0.0]
    with pytest.raises(ValueError, match="empty reference group"):
        rouge_scores_native(refs, hypos)


def test_build_failure_returns_none_not_raise(monkeypatch):
    """An unwritable cache location must produce the documented
    None -> pure-Python fallback, not a crash in every scorer."""
    from image_captioning_through_rl_tpu.native import build

    monkeypatch.setattr(build, "_LIB", None)
    monkeypatch.setattr(build, "_TRIED", False)
    monkeypatch.setenv("XDG_CACHE_HOME", "/proc/definitely/not/writable")
    assert build.load_fastmetrics() is None
    # and the corpus scorers fall back instead of crashing
    from image_captioning_through_rl_tpu.metrics.rouge import rouge_l

    assert rouge_l({0: ["a b"]}, {0: ["a b"]}) == 1.0

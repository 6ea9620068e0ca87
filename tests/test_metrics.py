"""Metric scorers: hand-computed cases + golden parity with the
reference's shipped pycocoevalcap results."""

import math
import os

import numpy as np
import pytest

from image_captioning_through_rl_tpu.metrics import (
    cider,
    corpus_bleu,
    load_textfiles,
    meteor,
    rouge_l,
    score,
)

REF_DUMP = "/root/reference/models_pretrained/no_wemb"


def test_bleu_perfect_match():
    refs = {0: ["a b c d"]}
    hypos = {0: ["a b c d"]}
    b = corpus_bleu(refs, hypos)
    np.testing.assert_allclose(b, [1.0] * 4, atol=1e-6)


def test_bleu_hand_computed():
    # hyp: "the cat sat" vs ref "the cat sat down"
    refs = {0: ["the cat sat down"]}
    hypos = {0: ["the cat sat"]}
    b = corpus_bleu(refs, hypos)
    bp = math.exp(1 - 4 / 3)  # testlen 3 < reflen 4
    np.testing.assert_allclose(b[0], 1.0 * bp, rtol=1e-6)  # p1 = 3/3
    np.testing.assert_allclose(b[1], math.sqrt(1.0) * bp, rtol=1e-6)  # p2 = 2/2
    np.testing.assert_allclose(b[2], 1.0 * bp, rtol=1e-5)  # p3 = 1/1


def test_rouge_l_hand_computed():
    refs = {0: ["a b c d e"]}
    hypos = {0: ["a c e"]}
    # lcs=3, p=1, r=3/5, beta=1.2 -> f = (1+b^2)pr / (r + b^2 p)
    beta = 1.2
    p, r = 1.0, 0.6
    expect = (1 + beta**2) * p * r / (r + beta**2 * p)
    np.testing.assert_allclose(rouge_l(refs, hypos), expect, rtol=1e-6)


def test_cider_identical_corpus_nonzero():
    refs = {0: ["a cat on a mat"], 1: ["a dog in a fog"]}
    hypos = {0: ["a cat on a mat"], 1: ["a dog in a fog"]}
    c = cider(refs, hypos)
    assert c > 0  # identical hypos score positive with idf over 2 docs


def test_meteor_perfect_and_zero():
    # METEOR-1.5 en parameters (alpha=.85, beta=.2, gamma=.6) penalize
    # even perfect short matches: 1 - 0.6*(1/3)**0.2 = 0.518 — the same
    # scale the Java tool produces (human COCO METEOR is ~0.33)
    np.testing.assert_allclose(
        meteor({0: ["a b c"]}, {0: ["a b c"]}), 1 - 0.6 * (1 / 3) ** 0.2, rtol=1e-9)
    assert meteor({0: ["a b c"]}, {0: ["x y z"]}) == 0.0


def _brute_force_align(hyp, ref):
    """Oracle: enumerate ALL maximum-cardinality exact matchings and
    return (max matches, min chunks)."""
    from collections import Counter

    total = sum(min(c, Counter(ref)[w]) for w, c in Counter(hyp).items())
    if total == 0:
        return 0, 0
    best = [total + 1]

    def chunks_of(pairs):
        c = 1
        for (i0, j0), (i1, j1) in zip(pairs, pairs[1:]):
            if i1 != i0 + 1 or j1 != j0 + 1:
                c += 1
        return c

    def rec(i, used, pairs):
        if len(pairs) == total:
            best[0] = min(best[0], chunks_of(pairs))
            return
        if i == len(hyp):
            return
        for j, w in enumerate(ref):
            if w == hyp[i] and j not in used:
                rec(i + 1, used | {j}, pairs + [(i, j)])
        rec(i + 1, used, pairs)

    rec(0, set(), [])
    return total, best[0]


def test_meteor_alignment_is_exact_on_adversarial_cases():
    """Cases where the greedy left-to-right matcher picks a suboptimal
    chunking; the exact aligner must find the true minimum."""
    from image_captioning_through_rl_tpu.metrics.meteor import _align

    cases = [
        # greedy matches a0->ref0, b->ref2, a2->ref1 (3 chunks); optimal
        # is a0->ref1, b->ref2 contiguous, a2->ref0 (2 chunks)
        ("a b a", "a a b"),
        ("a b a b", "b a b a"),
        ("the cat the mat", "the mat the cat"),
        ("a a b b", "b b a a"),
        ("x a x b x", "a x b x x"),
    ]
    for hyp_s, ref_s in cases:
        hyp, ref = hyp_s.split(), ref_s.split()
        assert _align(hyp, ref)[:2] == _brute_force_align(hyp, ref)


def test_meteor_alignment_matches_brute_force_randomly():
    import random

    from image_captioning_through_rl_tpu.metrics.meteor import _align

    rnd = random.Random(7)
    words = ["a", "b", "c", "d"]
    for _ in range(120):
        hyp = [rnd.choice(words) for _ in range(rnd.randint(1, 7))]
        ref = [rnd.choice(words) for _ in range(rnd.randint(1, 7))]
        assert _align(hyp, ref)[:2] == _brute_force_align(hyp, ref), (hyp, ref)


def test_meteor_alignment_fast_on_repetitive_full_length():
    """17-token highly repetitive sentences (worst-case branching) must
    align exactly without blowing up."""
    import time

    from image_captioning_through_rl_tpu.metrics.meteor import _align

    hyp = ("a b " * 9).split()[:17]
    ref = ("b a " * 9).split()[:17]
    t0 = time.perf_counter()
    m, chunks = _align(hyp, ref)[:2]
    assert time.perf_counter() - t0 < 2.0
    assert m == 17 - 1  # 9 a's + 8 b's vs 9 b's + 8 a's -> 8 + 8
    # hyp[1:] ("b a b a ...", 16 tokens) == ref[:16] exactly -> the
    # optimum is a single contiguous chunk, which greedy-left-to-right
    # ("a"->ref[1], "b"->ref[0], ...) can never find
    assert chunks == 1


def test_score_returns_all_keys():
    s = score({0: ["a b"]}, {0: ["a b"]})
    assert set(s) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"}


@pytest.mark.skipif(not os.path.isdir(REF_DUMP), reason="reference dump not mounted")
def test_golden_parity_with_reference_results():
    """Exact parity with the pycocoevalcap numbers the reference shipped
    (models_pretrained/no_wemb/results_non-curr.txt)."""
    ref, hypo = load_textfiles(
        os.path.join(REF_DUMP, "real_captions_non-curr.txt"),
        os.path.join(REF_DUMP, "generated_captions_non-curr.txt"),
    )
    bleus = corpus_bleu(ref, hypo)
    np.testing.assert_allclose(
        bleus,
        [0.13953640080706117, 0.052309596174356585, 0.02089955875550488, 0.008925489540673924],
        rtol=1e-12,
    )
    np.testing.assert_allclose(rouge_l(ref, hypo), 0.13655453262777192, rtol=1e-12)
    np.testing.assert_allclose(cider(ref, hypo), 0.20634003754324984, rtol=1e-12)


def test_porter_stemmer_classic_vectors():
    from image_captioning_through_rl_tpu.metrics.porter import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "agreed": "agre", "motoring": "motor", "hopping": "hop",
        "filing": "file", "happy": "happi", "relational": "relat",
        "digitizer": "digit", "vietnamization": "vietnam",
        "hopefulness": "hope", "triplicate": "triplic",
        "electriciti": "electr", "adjustable": "adjust",
        "replacement": "replac", "adoption": "adopt", "activate": "activ",
        "effective": "effect", "running": "run", "runs": "run",
    }
    for w, want in vectors.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_meteor_stem_module_aligns_inflections():
    """The stem module (weight 0.6) matches inflected forms the exact
    module misses, like METEOR-1.5's exact+stem configuration."""
    from image_captioning_through_rl_tpu.metrics.meteor import _align

    hyp = "the cats running fast".split()
    ref = "the cat runs quickly".split()
    matches, chunks, wsum, _ = _align(hyp, ref)
    assert matches == 3  # the (exact), cats~cat (stem), running~runs (stem)
    assert wsum == 1.0 + 0.6 + 0.6
    assert chunks == 1  # one contiguous run in both sentences

    # resolution order: chunk count beats module weight — the crossed
    # exact alignment (2 chunks, weight 2.0) loses to the in-order stem
    # alignment (1 chunk, weight 1.2), exactly like METEOR's resolver
    matches, chunks, wsum, _ = _align("run running".split(), "running run".split())
    assert (matches, chunks, wsum) == (2, 1, 1.2)

    # at equal chunks, exact is preferred over stem
    assert _align(["running"], ["running"])[:3] == (1, 1, 1.0)


def test_meteor_score_sensible_with_stems():
    # stem matches lift the score vs no module ("runs" ~ "running")
    with_stem = meteor({0: ["a dog runs"]}, {0: ["a dog running"]})
    no_overlap = meteor({0: ["a dog runs"]}, {0: ["a dog walked"]})
    assert with_stem > no_overlap > 0.0
    assert with_stem > 0.4


def test_meteor_delta_weighting_properties():
    """METEOR-1.5 delta (content/function-word weighting, delta=0.75,
    metrics/function_words.py): content-word matches carry 3x the P/R
    mass of function-word matches; perfect matches stay invariant."""
    from image_captioning_through_rl_tpu.metrics.function_words import (
        is_function_word,
    )

    # sanity of the shipped list
    assert is_function_word("the") and is_function_word("The")
    assert is_function_word("of") and is_function_word("is")
    assert not is_function_word("cat") and not is_function_word("running")

    # perfect hypothesis: P = R = 1 regardless of word types, so delta
    # cannot change the score (numerator equals denominator)
    ref = {0: ["the cat sat on the mat"]}
    assert meteor(ref, {0: ["the cat sat on the mat"]}) == pytest.approx(
        1 - 0.6 * (1 / 6) ** 0.2, rel=1e-9)

    # same match COUNT, different word types: matching the content words
    # must outscore matching only function words
    content_hyp = meteor(ref, {0: ["cat sat mat"]})
    function_hyp = meteor(ref, {0: ["the on the"]})
    assert content_hyp > function_hyp > 0.0

    # an extra UNMATCHED function word costs less precision than an
    # extra unmatched content word
    extra_function = meteor(ref, {0: ["the cat sat on the mat again"]})
    extra_content = meteor(ref, {0: ["the cat sat on the mat quickly"]})
    assert extra_function > extra_content
    # ("again" is in the function list, "quickly" is not)


def test_meteor_delta_hand_computed_value():
    """One fully hand-computed delta-weighted score: ref 'the cat',
    hyp 'the dog'. Only 'the' aligns (function word, mass 0.25 each
    side); hyp/ref mass = 0.25 + 0.75 = 1.0 -> P = R = 0.25;
    fmean = PR/(0.85P + 0.15R) = 0.25; penalty = 0.6*(1/1)^0.2 = 0.6;
    score = 0.25 * 0.4 = 0.1."""
    got = meteor({0: ["the cat"]}, {0: ["the dog"]})
    assert got == pytest.approx(0.25 * (1 - 0.6), rel=1e-9)


def test_score_empty_corpus_returns_zeros():
    """An empty caption dump (aborted eval) scores 0 everywhere instead
    of crashing CIDEr with log(0) (review round-3 regression)."""
    from image_captioning_through_rl_tpu.metrics.score import score

    s = score({}, {})
    assert set(s) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                      "METEOR", "ROUGE_L", "CIDEr"}
    assert all(v == 0.0 for v in s.values())


def test_score_cli_on_dump_files(tmp_path, capsys):
    """python -m ...cli.score real.txt gen.txt scores a dump pair and
    appends to a results file."""
    import json

    from image_captioning_through_rl_tpu.cli.score import main as score_main

    real = tmp_path / "real.txt"
    gen = tmp_path / "gen.txt"
    real.write_text("<START> a cat sat <END>\n<START> a dog ran <END>\n")
    gen.write_text("<START> a cat sat <END>\n<START> a bird flew <END>\n")
    res = tmp_path / "results.txt"
    out = score_main([str(real), str(gen), "--results", str(res), "--json"])
    printed = json.loads(capsys.readouterr().out.strip())
    assert printed == out
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                        "METEOR", "ROUGE_L", "CIDEr"}
    assert 0 < out["Bleu_1"] <= 1
    assert "results" in res.read_text() and str(out) in res.read_text()


def test_partial_pycocoevalcap_install_falls_back(monkeypatch):
    """If only some pycocoevalcap subpackages import (slim or damaged
    install), score() must fall back to the native scorers, not crash
    on the missing ones mid-call."""
    import sys
    import types

    import importlib

    # the metrics package re-exports the score FUNCTION over the
    # submodule attribute, so `import ... as` would bind the function
    score_mod = importlib.import_module(
        "image_captioning_through_rl_tpu.metrics.score")

    fake_pkg = types.ModuleType("pycocoevalcap")
    fake_bleu_pkg = types.ModuleType("pycocoevalcap.bleu")
    fake_bleu = types.ModuleType("pycocoevalcap.bleu.bleu")
    fake_bleu.Bleu = object
    for name, mod in [("pycocoevalcap", fake_pkg),
                      ("pycocoevalcap.bleu", fake_bleu_pkg),
                      ("pycocoevalcap.bleu.bleu", fake_bleu)]:
        monkeypatch.setitem(sys.modules, name, mod)
    monkeypatch.setattr(score_mod, "_HAVE_PYCOCO", None)  # re-probe
    s = score_mod.score({0: ["a cat"]}, {0: ["a cat"]})
    assert s["Bleu_1"] > 0.9  # served by the native/pure scorers
    assert score_mod._HAVE_PYCOCO is False

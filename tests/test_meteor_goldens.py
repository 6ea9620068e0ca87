"""METEOR external micro-goldens: hand-derived scores from the
published formula.

Every expected value here is computed IN THE TEST, by hand, straight
from the METEOR-1.5 scoring equations (Denkowski & Lavie 2014: the
delta-weighted P/R of eq. 1, the alpha f-mean, the gamma/beta
fragmentation penalty) with the English ranking parameters
alpha=0.85, beta=0.2, gamma=0.6, delta=0.75 — never by calling the
implementation under test. They are the external anchor the
implementation is checked against (the Java METEOR-1.5 jar itself is
not redistributable; reference metrics.py:23): each case walks one
match module (exact / stem / synonym / paraphrase) or one formula
term (delta weighting, fragmentation) through explicit arithmetic.

Word classes used below (metrics/function_words.py): the/a/in/of/
before are FUNCTION words (delta mass 0.25); cat/dog/cats/stop/front/
house/happy/glad/child and the greek letters are CONTENT words
(delta mass 0.75).
"""

import pytest

from image_captioning_through_rl_tpu.metrics.meteor import meteor_sentence
from image_captioning_through_rl_tpu.metrics.synonyms import (
    MeteorResources,
    ParaphraseTable,
    SynonymLookup,
)

A, B, G, D = 0.85, 0.2, 0.6, 0.75  # METEOR-1.5 English parameters
NO_RES = MeteorResources()


def fmean(p, r):
    return p * r / (A * p + (1 - A) * r)


def penalty(chunks, m_avg):
    return G * (chunks / m_avg) ** B


def test_exact_module_identical_sentences():
    """4 content words, all exact (w=1): P=R=1, one chunk of 4."""
    want = fmean(1.0, 1.0) * (1 - penalty(1, 4))  # = 1 - 0.6*(1/4)^0.2
    got = meteor_sentence("alpha beta gamma delta",
                          ["alpha beta gamma delta"], NO_RES)
    assert got == pytest.approx(want, rel=1e-12)
    assert got == pytest.approx(0.545285030046881, rel=1e-9)  # literal anchor


def test_delta_weighting_function_word_match():
    """hyp 'the cat' vs ref 'the dog': only the FUNCTION word matches.
    P = 1*0.25 / (0.25+0.75) = 0.25 = R; fmean = 0.25; one 1-word
    chunk -> penalty = 0.6; score = 0.25 * 0.4 = 0.1 exactly."""
    got = meteor_sentence("the cat", ["the dog"], NO_RES)
    assert got == pytest.approx(0.1, rel=1e-12)


def test_delta_weighting_content_word_match():
    """hyp 'red cat' vs ref 'blue cat': only the CONTENT word matches.
    P = 1*0.75 / 1.5 = 0.5 = R; fmean = 0.5; penalty = 0.6;
    score = 0.5 * 0.4 = 0.2 — double the function-word case, the
    delta asymmetry in isolation."""
    got = meteor_sentence("red cat", ["blue cat"], NO_RES)
    assert got == pytest.approx(0.2, rel=1e-12)


def test_stem_module_weight():
    """'cats' vs 'cat' match only through Porter stems (w=0.6):
    P = R = 0.6*0.75/0.75 = 0.6; fmean = 0.6; penalty = 0.6;
    score = 0.6 * 0.4 = 0.24."""
    got = meteor_sentence("cats", ["cat"], NO_RES)
    assert got == pytest.approx(0.24, rel=1e-12)


def test_fragmentation_penalty():
    """Same 4 exact matches, but the reference permutes the middle
    words: every match starts its own chunk (4 chunks over m_avg 4),
    so the penalty hits its gamma ceiling: score = 1 - 0.6 = 0.4.
    Against the 1-chunk case above this isolates the beta exponent."""
    got = meteor_sentence("alpha beta gamma delta",
                          ["alpha gamma beta delta"], NO_RES)
    assert got == pytest.approx(fmean(1, 1) * (1 - penalty(4, 4)), rel=1e-12)
    assert got == pytest.approx(0.4, rel=1e-12)


def test_best_reference_wins():
    """Multi-reference scoring takes the max: the identical ref beats
    the permuted one."""
    got = meteor_sentence("alpha beta gamma delta",
                          ["alpha gamma beta delta",
                           "alpha beta gamma delta"], NO_RES)
    assert got == pytest.approx(0.545285030046881, rel=1e-9)


def test_synonym_module_golden(tmp_path):
    """'happy' ~ 'glad' through a 2-word synthetic synset (w=0.8) plus
    one exact content match:
    P = R = (0.8*0.75 + 1*0.75) / 1.5 = 0.9; fmean = 0.9;
    one 2-word chunk -> penalty = 0.6*(1/2)^0.2;
    score = 0.9 * (1 - 0.6*0.5**0.2)."""
    f = tmp_path / "synsets.txt"
    f.write_text("happy glad\n")
    res = MeteorResources(synonyms=SynonymLookup.from_synsets_file(str(f)))
    want = fmean(0.9, 0.9) * (1 - penalty(1, 2))
    got = meteor_sentence("happy child", ["glad child"], res)
    assert got == pytest.approx(want, rel=1e-12)
    assert got == pytest.approx(0.429902695820093, rel=1e-9)


def test_paraphrase_module_golden(tmp_path):
    """'in front of' ~ 'before' through a synthetic phrase table
    (w=0.6), hand-walking the span P/R masses:
      hyp 'stop in front of the house' (mass 3.0: C F C F F C)
      ref 'stop before the house'     (mass 2.0: C F F C)
      p_num = 1*.75 + 0.6*(.25+.75+.25) + 1*.25 + 1*.75 = 2.5 -> P=5/6
      r_num = 1*.75 + 0.6*.25          + 1*.25 + 1*.75 = 1.9 -> R=0.95
      all four spans chain contiguously on both sides -> 1 chunk,
      m_avg = (6+4)/2 = 5."""
    f = tmp_path / "paraphrases.txt"
    f.write_text("in front of ||| before\n")
    res = MeteorResources(paraphrases=ParaphraseTable.from_file(str(f)))
    p, r = 2.5 / 3.0, 1.9 / 2.0
    want = fmean(p, r) * (1 - penalty(1, 5))
    got = meteor_sentence("stop in front of the house",
                          ["stop before the house"], res)
    assert got == pytest.approx(want, rel=1e-12)
    assert got == pytest.approx(0.525833096673568, rel=1e-9)


def test_score_e2e_with_synthetic_resources(tmp_path, monkeypatch):
    """The full-resource code path end-to-end through score(): env-var
    resolved synthetic synonym + paraphrase files drive the METEOR
    column of the public scorer to the hand value."""
    syn = tmp_path / "synsets.txt"
    syn.write_text("happy glad\n")
    para = tmp_path / "paraphrases.txt"
    para.write_text("in front of ||| before\n")
    monkeypatch.setenv("ICRL_METEOR_SYNONYMS", str(syn))
    monkeypatch.setenv("ICRL_METEOR_PARAPHRASES", str(para))
    from image_captioning_through_rl_tpu.metrics import score

    s = score({0: ["glad child"], 1: ["stop before the house"]},
              {0: ["happy child"], 1: ["stop in front of the house"]})
    want = (fmean(0.9, 0.9) * (1 - penalty(1, 2))
            + fmean(2.5 / 3, 0.95) * (1 - penalty(1, 5))) / 2
    assert s["METEOR"] == pytest.approx(want, rel=1e-12)


def test_score_e2e_resource_free_native(monkeypatch):
    """Resource-free score() routes METEOR through the native C++
    aligner (metrics/native) — pinned to the same hand values."""
    monkeypatch.delenv("ICRL_METEOR_SYNONYMS", raising=False)
    monkeypatch.delenv("ICRL_METEOR_PARAPHRASES", raising=False)
    from image_captioning_through_rl_tpu.metrics import score

    s = score({0: ["the dog"], 1: ["cat"]}, {0: ["the cat"], 1: ["cats"]})
    assert s["METEOR"] == pytest.approx((0.1 + 0.24) / 2, rel=1e-12)

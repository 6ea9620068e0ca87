"""METEOR synonym + paraphrase match modules (metrics/synonyms.py,
metrics/meteor.py).

The Java METEOR-1.5 tool's synonym (WordNet) and paraphrase (table)
modules are resource-gated here; these tests exercise both loaders and
the generalized span aligner with small offline fixtures.
"""

import gzip
import os
import random

import pytest

from image_captioning_through_rl_tpu.metrics.meteor import (
    _align,
    _align_spans,
    _phrase_candidates,
    meteor,
    meteor_sentence,
)
from image_captioning_through_rl_tpu.metrics.synonyms import (
    MeteorResources,
    ParaphraseTable,
    SynonymLookup,
    default_resources,
)

NO_RES = MeteorResources()


@pytest.fixture
def syn(tmp_path):
    p = tmp_path / "synsets.txt"
    p.write_text(
        "# one synset per line\n"
        "dog canine hound\n"
        "quick fast rapid\n"
        "singleton\n"  # ignored: can never match
        "\n"
    )
    return SynonymLookup.from_synsets_file(str(p))


@pytest.fixture
def para(tmp_path):
    p = tmp_path / "paraphrases.txt"
    p.write_text(
        "# weight column skipped when present\n"
        "in front of\tbefore\n"
        "0.73 ||| a large number of ||| many\n"
        "couch\tsofa\n"
    )
    return ParaphraseTable.from_file(str(p))


def test_synonym_lookup_flat_file(syn):
    assert syn.are_synonyms("dog", "hound")
    assert syn.are_synonyms("canine", "dog")
    assert syn.are_synonyms("fast", "rapid")
    assert not syn.are_synonyms("dog", "fast")
    assert not syn.are_synonyms("dog", "dog") or True  # caller handles exact
    assert not syn.are_synonyms("singleton", "singleton")
    assert not syn.are_synonyms("missing", "dog")


def test_synonym_lookup_wordnet_dir(tmp_path):
    """WordNet 3.x index-file format: license header lines start with
    two spaces; synset ids are the trailing synset_cnt offsets."""
    d = tmp_path / "dict"
    d.mkdir()
    (d / "index.noun").write_text(
        "  1 This software and database is provided...\n"
        "dog n 2 1 @ 2 1 02084071 10114209\n"
        "hound n 1 1 @ 1 0 02084071\n"
        "cat n 1 1 @ 1 1 02121620\n"
        "hot_dog n 1 1 @ 1 0 07697537\n"  # collocation: skipped
    )
    (d / "index.verb").write_text(
        "run v 1 1 @ 1 1 01926311\n"
        "sprint v 1 1 @ 1 0 01926311\n"
    )
    wn = SynonymLookup.from_wordnet_dir(str(d))
    assert wn.are_synonyms("dog", "hound")
    assert wn.are_synonyms("run", "sprint")
    assert not wn.are_synonyms("dog", "cat")
    assert not wn.are_synonyms("hot_dog", "dog")
    # same offset in DIFFERENT pos files must not collide
    (d / "index.adj").write_text("red a 1 1 & 1 0 02084071\n")
    wn2 = SynonymLookup.from_wordnet_dir(str(d))
    assert not wn2.are_synonyms("red", "dog")

    with pytest.raises(FileNotFoundError):
        SynonymLookup.from_wordnet_dir(str(tmp_path / "empty"))


def test_synonym_lookup_load_dispatch(tmp_path, syn):
    d = tmp_path / "dict"
    d.mkdir()
    (d / "index.noun").write_text("dog n 1 1 @ 1 1 02084071\n"
                                  "hound n 1 1 @ 1 0 02084071\n")
    assert SynonymLookup.load(str(d)).are_synonyms("dog", "hound")
    f = tmp_path / "s.txt"
    f.write_text("cold chilly\n")
    assert SynonymLookup.load(str(f)).are_synonyms("cold", "chilly")


def test_paraphrase_table_formats(para):
    assert para.matches(("in", "front", "of"), ("before",))
    assert para.matches(("before",), ("in", "front", "of"))  # symmetric
    assert para.matches(("a", "large", "number", "of"), ("many",))
    assert para.matches(("couch",), ("sofa",))
    assert not para.matches(("couch",), ("chair",))
    assert para.max_len == 4
    assert len(para) == 3


def test_paraphrase_table_gzip(tmp_path):
    p = tmp_path / "para.tsv.gz"
    with gzip.open(p, "wt") as f:
        f.write("next to\tbeside\n")
    t = ParaphraseTable.from_file(str(p))
    assert t.matches(("next", "to"), ("beside",))


def test_synonym_module_alignment_weight(syn):
    """Synonym edges carry weight 0.8: exact 1.0 > synonym 0.8 > stem
    0.6, per METEOR-1.5's English module weights."""
    matches, chunks, wsum, pairs = _align(
        "a fast dog".split(), "a quick hound".split(), syn=syn)
    assert matches == 3 and chunks == 1
    assert wsum == pytest.approx(1.0 + 0.8 + 0.8)
    assert [w for _, _, w in pairs] == [1.0, 0.8, 0.8]
    # without the resource the synonym pairs vanish
    assert _align("a fast dog".split(), "a quick hound".split())[0] == 1


def test_synonym_module_scores_between_none_and_exact(syn):
    ref = {0: ["a fast dog runs"]}
    res = MeteorResources(synonyms=syn)
    exact = meteor(ref, {0: ["a fast dog runs"]}, resources=res)
    synonym = meteor(ref, {0: ["a rapid hound runs"]}, resources=res)
    without = meteor(ref, {0: ["a rapid hound runs"]}, resources=NO_RES)
    assert exact > synonym > without


def test_paraphrase_module_spans(para):
    hyp = "a dog sits in front of the couch".split()
    ref = "a dog sits before the sofa".split()
    res = MeteorResources(paraphrases=para)
    cands = _phrase_candidates(hyp, ref, para)
    assert (3, 3, 3, 1, 0.6) in cands  # "in front of" ~ "before"
    assert (7, 1, 5, 1, 0.6) in cands  # "couch" ~ "sofa"
    with_para = meteor_sentence(" ".join(hyp), [" ".join(ref)], resources=res)
    without = meteor_sentence(" ".join(hyp), [" ".join(ref)], resources=NO_RES)
    assert with_para > without > 0.0
    # every span extends the previous one on both sides ("a dog sits" |
    # "in front of"~"before" | "the" | "couch"~"sofa") -> ONE chunk
    hyp_cov, ref_cov, chunks, matches = _align_spans(
        hyp, ref, None, cands)
    assert (hyp_cov, ref_cov) == (8, 6)
    assert chunks == 1
    # hand-computed score: delta masses (content 0.75 / function 0.25)
    # hyp = F C C F C F F C (mass 4.0), ref = F C C F F C (mass 3.0);
    # exact matches weight 1.0 on {a, dog, sits, the}, paraphrase
    # matches weight 0.6 over their covered words
    p = (1.0 * (0.25 + 0.75 + 0.75 + 0.25)
         + 0.6 * (0.25 + 0.75 + 0.25) + 0.6 * 0.75) / 4.0
    r = (1.0 * (0.25 + 0.75 + 0.75 + 0.25) + 0.6 * 0.25 + 0.6 * 0.75) / 3.0
    fmean = p * r / (0.85 * p + 0.15 * r)
    m_avg = (8 + 6) / 2
    assert with_para == pytest.approx(
        fmean * (1 - 0.6 * (1 / m_avg) ** 0.2), rel=1e-9)


def test_paraphrase_coverage_beats_weight(para):
    """The resolver maximizes covered words first: a 3+1-word paraphrase
    match must win over a 1+1 stem/exact match inside the same span."""
    hyp = "in front of".split()
    ref = "before".split()
    cands = _phrase_candidates(hyp, ref, para)
    hyp_cov, ref_cov, chunks, matches = _align_spans(hyp, ref, None, cands)
    assert (hyp_cov, ref_cov, chunks) == (3, 1, 1)
    assert matches == [(0, 3, 0, 1, 0.6)]


def test_span_aligner_agrees_with_word_aligner_without_phrases(syn):
    """With no phrase candidates the span DFS and the word-level DFS
    must produce identical (coverage, chunks) results."""
    rnd = random.Random(11)
    words = ["a", "b", "dog", "hound", "fast", "quick"]
    for _ in range(60):
        hyp = [rnd.choice(words) for _ in range(rnd.randint(1, 6))]
        ref = [rnd.choice(words) for _ in range(rnd.randint(1, 6))]
        n_pairs, chunks, wsum, _ = _align(hyp, ref, syn=syn)
        hyp_cov, ref_cov, span_chunks, _ = _align_spans(hyp, ref, syn, [])
        assert (hyp_cov, ref_cov) == (n_pairs, n_pairs), (hyp, ref)
        if n_pairs:
            assert span_chunks == chunks, (hyp, ref)


def test_env_resolution(tmp_path, monkeypatch):
    s = tmp_path / "syn.txt"
    s.write_text("sofa couch\n")
    p = tmp_path / "para.txt"
    p.write_text("in front of\tbefore\n")
    monkeypatch.setenv("ICRL_METEOR_SYNONYMS", str(s))
    monkeypatch.setenv("ICRL_METEOR_PARAPHRASES", str(p))
    res = default_resources()
    assert res.synonyms.are_synonyms("sofa", "couch")
    assert res.paraphrases.matches(("before",), ("in", "front", "of"))
    # meteor() with resources=None picks the env resources up
    assert (meteor({0: ["the couch"]}, {0: ["the sofa"]})
            > meteor({0: ["the couch"]}, {0: ["the sofa"]}, resources=NO_RES))
    monkeypatch.delenv("ICRL_METEOR_SYNONYMS")
    monkeypatch.delenv("ICRL_METEOR_PARAPHRASES")
    empty = default_resources()
    assert empty.synonyms is None and empty.paraphrases is None


def test_paraphrase_table_hash_handling(tmp_path):
    """'#' is a comment only at line start — real paraphrase tables have
    no inline comment syntax and phrases like 'number #1' contain it."""
    p = tmp_path / "para.tsv"
    p.write_text("# full-line comment\nnumber #1\tnumber one\n")
    t = ParaphraseTable.from_file(str(p))
    assert t.matches(("number", "#1"), ("number", "one"))
    assert len(t) == 1


def test_synsets_file_hash_handling(tmp_path):
    """Only full lines starting with '#' are comments; a mid-line '#'
    is a legitimate token (no inline stripping)."""
    f = tmp_path / "s.txt"
    f.write_text("# comment line\none #1\n")
    lk = SynonymLookup.from_synsets_file(str(f))
    assert lk.are_synonyms("one", "#1")


def test_synonym_and_paraphrase_matching_is_case_insensitive(tmp_path):
    """Entries are lowercased at load; queries must normalize the same
    way (Java METEOR lowercases its input wholesale)."""
    s = tmp_path / "syn.txt"
    s.write_text("dog canine\n")
    lk = SynonymLookup.from_synsets_file(str(s))
    assert lk.are_synonyms("Dog", "CANINE")
    p = tmp_path / "para.tsv"
    p.write_text("next to\tbeside\n")
    t = ParaphraseTable.from_file(str(p))
    assert t.matches(("Next", "To"), ("Beside",))
    res = MeteorResources(synonyms=lk)
    up = meteor_sentence("the Dog sat", ["the canine sat"], res)
    low = meteor_sentence("the dog sat", ["the canine sat"], res)
    assert up == low > 0


def test_paraphrase_numeric_pair_not_eaten_as_weight(tmp_path):
    """'2 ||| two' is a numeric paraphrase pair — the weight-column
    heuristic only applies when two phrases FOLLOW the number."""
    p = tmp_path / "para.txt"
    p.write_text("2 ||| two\n0.5 ||| a number of ||| several\n")
    t = ParaphraseTable.from_file(str(p))
    assert t.matches(("2",), ("two",))
    assert t.matches(("a", "number", "of"), ("several",))
    assert len(t) == 2

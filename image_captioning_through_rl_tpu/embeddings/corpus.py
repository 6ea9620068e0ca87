"""Corpus preparation (reference utilities.py:361-372)."""

from __future__ import annotations

import re
import unicodedata
from typing import List

from ..data.coco import CocoData

# gensim's PAT_ALPHABETIC: runs of word characters that are not digits
# (letters of ANY script plus underscore — accented tokens survive,
# matching the reference's simple_preprocess(deacc=False) default)
_TOKEN = re.compile(r"(?:(?!\d)\w)+", re.UNICODE)


def simple_preprocess(
    doc: str, deacc: bool = False, min_len: int = 2, max_len: int = 15
) -> List[str]:
    """Lowercase, tokenize, keep tokens of length [min, max] — the
    gensim ``simple_preprocess`` contract the reference relies on
    (utilities.py:361-372). ``deacc=False`` is gensim's default: accented
    words are kept intact so they align against the dataset vocabulary
    instead of falling to the OOV path."""
    doc = doc.lower()
    if deacc:
        doc = unicodedata.normalize("NFKD", doc)
        doc = doc.encode("ascii", "ignore").decode("ascii")
    return [t for t in _TOKEN.findall(doc) if min_len <= len(t) <= max_len]


def get_preprocessed_corpus(data: CocoData) -> List[List[str]]:
    """De-tokenize train+val captions back to word lists
    (reference utilities.py:361-372)."""
    idx_to_word = data.idx_to_word
    corpus = [
        simple_preprocess(" ".join(idx_to_word[int(d)] for d in sent))
        for sent in data.train_captions
    ]
    corpus += [
        simple_preprocess(" ".join(idx_to_word[int(d)] for d in sent))
        for sent in data.val_captions
    ]
    return corpus

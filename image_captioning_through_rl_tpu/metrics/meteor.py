"""METEOR (native, exact-match module only).

pycocoevalcap's METEOR shells out to the Java METEOR-1.5 jar (reference
metrics.py:23); that binary and its paraphrase tables are not portable
dependencies, so this is a from-scratch implementation of the METEOR
scoring scheme with the *exact-match* module: unigram alignment
maximizing matches while minimizing chunk count, harmonic mean with
alpha=0.9, fragmentation penalty gamma=0.5, beta=3.

Scores correlate closely with METEOR-exact but are not bit-identical to
the Java tool (which adds stem/synonym/paraphrase modules). The
reference's shipped results do not include METEOR at all
(BASELINE.md), so no parity target exists.
"""

from __future__ import annotations

from typing import Dict, List

_ALPHA = 0.9
_GAMMA = 0.5
_BETA = 3.0


def _align(hyp: List[str], ref: List[str]):
    """Greedy-in-order exact alignment; returns (matches, chunks).

    Standard METEOR picks, among maximum-cardinality matchings, one with
    the fewest chunks. A left-to-right greedy matching over positions is
    a close, deterministic approximation.
    """
    used_ref = [False] * len(ref)
    pairs = []  # (hyp_pos, ref_pos)
    for i, w in enumerate(hyp):
        for j, r in enumerate(ref):
            if not used_ref[j] and r == w:
                used_ref[j] = True
                pairs.append((i, j))
                break
    if not pairs:
        return 0, 0
    chunks = 1
    for (i0, j0), (i1, j1) in zip(pairs, pairs[1:]):
        if i1 != i0 + 1 or j1 != j0 + 1:
            chunks += 1
    return len(pairs), chunks


def meteor_sentence(hypo: str, refs: List[str]) -> float:
    hyp = hypo.split()
    best = 0.0
    for ref_str in refs:
        ref = ref_str.split()
        m, chunks = _align(hyp, ref)
        if m == 0:
            continue
        p = m / len(hyp)
        r = m / len(ref)
        fmean = p * r / (_ALPHA * p + (1 - _ALPHA) * r)
        frag = chunks / m
        penalty = _GAMMA * (frag**_BETA)
        best = max(best, fmean * (1.0 - penalty))
    return best


def meteor(refs: Dict[int, List[str]], hypos: Dict[int, List[str]]) -> float:
    scores = [meteor_sentence(hypos[i][0], refs[i]) for i in hypos]
    return sum(scores) / len(scores) if scores else 0.0

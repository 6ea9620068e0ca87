"""METEOR (native, exact-match module only).

pycocoevalcap's METEOR shells out to the Java METEOR-1.5 jar (reference
metrics.py:23); that binary and its paraphrase tables are not portable
dependencies, so this is a from-scratch implementation of the METEOR
scoring scheme with the *exact-match* module: unigram alignment
maximizing matches and, among maximum-cardinality matchings, minimizing
the chunk count (METEOR's alignment resolution order), then harmonic
mean with alpha=0.9 and fragmentation penalty gamma=0.5, beta=3.

The alignment search is exact: a depth-first search over per-word
position assignments with feasibility and best-chunk pruning (captions
are <= 17 tokens, so the full space is cheap to search; METEOR-1.5
itself approximates this with a beam of 40). Remaining gap vs the Java
tool: the stem / synonym / paraphrase match modules are not
implemented, so only exact surface matches align. The reference's
shipped results do not include METEOR at all (BASELINE.md), so no
parity target exists.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

_ALPHA = 0.9
_GAMMA = 0.5
_BETA = 3.0


def _align(hyp: List[str], ref: List[str]) -> Tuple[int, int]:
    """Exact-match METEOR alignment; returns ``(matches, chunks)``.

    ``matches`` is the maximum matching cardinality (per word type,
    ``min(count_hyp, count_ref)`` — fixed for the exact module);
    ``chunks`` is the *minimum* chunk count over all maximum-cardinality
    matchings, found by exhaustive DFS with pruning. A chunk is a
    maximal run of matched pairs contiguous and in order in both
    sentences.
    """
    n = len(hyp)
    counts_r = Counter(ref)
    total = sum(min(c, counts_r[w]) for w, c in Counter(hyp).items())
    if total == 0:
        return 0, 0

    ref_positions: Dict[str, List[int]] = {}
    for j, w in enumerate(ref):
        ref_positions.setdefault(w, []).append(j)

    # suffix_counts[i] = word counts of hyp[i:] (feasibility bound)
    suffix_counts: List[Counter] = [Counter() for _ in range(n + 1)]
    for i in range(n - 1, -1, -1):
        suffix_counts[i] = suffix_counts[i + 1].copy()
        suffix_counts[i][hyp[i]] += 1

    avail_r = dict(counts_r)  # remaining ref capacity per word
    used_j = [False] * len(ref)
    best = total + 1  # a matching of m pairs has at most m chunks

    def dfs(i: int, matched: int, chunks: int, last_i: int, last_j: int) -> None:
        nonlocal best
        if chunks >= best:  # final chunks can only grow
            return
        if matched == total:
            best = chunks
            return
        if i == n:
            return
        # feasibility: can the suffix still reach maximum cardinality?
        need = total - matched
        cap = 0
        suf = suffix_counts[i]
        for w, c in suf.items():
            a = avail_r.get(w, 0)
            if a:
                cap += c if c < a else a
                if cap >= need:
                    break
        if cap < need:
            return

        w = hyp[i]
        if avail_r.get(w, 0):
            cands = ref_positions[w]
            # try the chunk-extending position first so good solutions
            # (and thus tight pruning bounds) are found early
            order = cands
            if last_i == i - 1 and (last_j + 1) in cands and not used_j[last_j + 1]:
                order = [last_j + 1] + [j for j in cands if j != last_j + 1]
            for j in order:
                if used_j[j]:
                    continue
                extend = last_i == i - 1 and j == last_j + 1
                used_j[j] = True
                avail_r[w] -= 1
                dfs(i + 1, matched + 1, chunks + (0 if extend else 1), i, j)
                avail_r[w] += 1
                used_j[j] = False
        # skipping hyp[i] is allowed only if max cardinality survives —
        # checked by the feasibility bound at the next level
        dfs(i + 1, matched, chunks, last_i, last_j)

    dfs(0, 0, 0, -2, -2)
    return total, best


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

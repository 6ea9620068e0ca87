"""METEOR (native: exact + stem modules, delta weighting, METEOR-1.5
parameters).

pycocoevalcap's METEOR shells out to the Java METEOR-1.5 jar (reference
metrics.py:23); that binary and its resources are not portable
dependencies, so this is a from-scratch implementation of the METEOR
scheme:

  * match modules **exact** (weight 1.0) and **stem** (weight 0.6,
    Porter stemmer — :mod:`.porter`), applied like the Java tool:
    a hypothesis word may align to a reference word when the surface
    forms match, or failing that when their stems match;
  * alignment resolution order: maximum matched-word count first, then
    MINIMUM chunk count, then maximum module-weight sum (exact matches
    preferred over stem matches) — searched exactly by DFS with
    bipartite-matching feasibility bounds (captions are <= 17 tokens;
    METEOR-1.5 itself approximates this with a beam of 40);
  * **content/function-word weighting** (the METEOR-1.5 ``delta``
    parameter): each word contributes ``delta`` to precision/recall
    mass if it is a content word and ``1 - delta`` if it is a function
    word (:mod:`.function_words`), on the hypothesis side for P and the
    reference side for R (Denkowski & Lavie 2014, eq. 1-2);
  * METEOR-1.5 English ranking parameters: alpha=0.85, beta=0.2,
    gamma=0.6, delta=0.75.

Remaining gaps vs the Java tool (documented, unverifiable without it):
the synonym (WordNet) and paraphrase (table) match modules are absent,
and the shipped function-word list is a curated closed-class list
rather than the tool's corpus-frequency-derived resource. Because the
missing modules can only ADD matches, the scores reported here are a
LOWER BOUND on what Java METEOR-1.5 would report — do not compare them
against published METEOR numbers from the Java tool. The reference's
shipped results do not include METEOR at all (BASELINE.md), so no
parity target exists.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .function_words import is_function_word
from .porter import porter_stem

_ALPHA = 0.85
_BETA = 0.2
_GAMMA = 0.6
_DELTA = 0.75
_W_EXACT = 1.0
_W_STEM = 0.6


def _max_matching(edges: List[List[int]], n_right: int, left_alive, right_alive) -> int:
    """Maximum bipartite matching size (augmenting paths) over the
    still-alive subgraph. ``edges[i]`` lists right nodes of left i."""
    match_r = [-1] * n_right

    def augment(i, seen):
        for j in edges[i]:
            if right_alive[j] and not seen[j]:
                seen[j] = True
                if match_r[j] == -1 or augment(match_r[j], seen):
                    match_r[j] = i
                    return True
        return False

    size = 0
    for i, alive in enumerate(left_alive):
        if alive and augment(i, [False] * n_right):
            size += 1
    return size


def _align(
    hyp: List[str], ref: List[str]
) -> Tuple[int, int, float, List[Tuple[int, int]]]:
    """Exact+stem METEOR alignment.

    Returns ``(matches, chunks, weighted_matches, pairs)`` for the
    alignment that maximizes matches, then minimizes chunks, then
    maximizes the module-weight sum; ``pairs`` are the chosen
    ``(hyp_i, ref_j)`` matches (for the delta-weighted P/R
    computation).
    """
    n, m = len(hyp), len(ref)
    hyp_stem = [porter_stem(w) for w in hyp]
    ref_stem = [porter_stem(w) for w in ref]

    # candidate edges + per-pair module weight (exact beats stem)
    edges: List[List[int]] = [[] for _ in range(n)]
    weight: Dict[Tuple[int, int], float] = {}
    for i in range(n):
        for j in range(m):
            if hyp[i] == ref[j]:
                edges[i].append(j)
                weight[(i, j)] = _W_EXACT
            elif hyp_stem[i] == ref_stem[j]:
                edges[i].append(j)
                weight[(i, j)] = _W_STEM

    left_all = [True] * n
    right_alive = [True] * m
    total = _max_matching(edges, m, left_all, right_alive)
    if total == 0:
        return 0, 0, 0.0, []

    best = [total + 1, -1.0, []]  # (min chunks, max weight, its pairs)
    trail: List[Tuple[int, int]] = []

    def dfs(i, matched, chunks, wsum, last_i, last_j):
        if chunks > best[0]:  # chunk count only grows
            return
        if chunks == best[0] and wsum + (total - matched) * _W_EXACT <= best[1]:
            return  # cannot beat the incumbent weight at equal chunks
        if matched == total:
            if chunks < best[0] or (chunks == best[0] and wsum > best[1]):
                best[0], best[1], best[2] = chunks, wsum, list(trail)
            return
        if i == n:
            return
        # feasibility: can the remaining graph still reach max cardinality?
        left_alive = [False] * i + [True] * (n - i)
        if matched + _max_matching(edges, m, left_alive, right_alive) < total:
            return

        cands = edges[i]
        if last_i == i - 1 and (last_j + 1) in cands and right_alive[last_j + 1]:
            cands = [last_j + 1] + [j for j in cands if j != last_j + 1]
        for j in cands:
            if not right_alive[j]:
                continue
            extend = last_i == i - 1 and j == last_j + 1
            right_alive[j] = False
            trail.append((i, j))
            dfs(i + 1, matched + 1, chunks + (0 if extend else 1),
                wsum + weight[(i, j)], i, j)
            trail.pop()
            right_alive[j] = True
        dfs(i + 1, matched, chunks, wsum, last_i, last_j)

    dfs(0, 0, 0, 0.0, -2, -2)
    return total, best[0], best[1], best[2]


def _delta_mass(words: List[str]) -> float:
    """Total content/function-weighted mass of a token list."""
    return sum(_DELTA if not is_function_word(w) else 1.0 - _DELTA
               for w in words)


def meteor_sentence(hypo: str, refs: List[str]) -> float:
    hyp = hypo.split()
    best = 0.0
    for ref_str in refs:
        ref = ref_str.split()
        if not hyp or not ref:
            continue
        matches, chunks, _, pairs = _align(hyp, ref)
        if matches == 0:
            continue
        # delta-weighted precision/recall (Denkowski & Lavie 2014 eq. 1):
        # a matched word contributes its module weight scaled by delta
        # (content) or 1-delta (function) — judged on the hypothesis
        # side for P and the reference side for R
        p_num = r_num = 0.0
        for i, j in pairs:
            w = _W_EXACT if hyp[i] == ref[j] else _W_STEM
            p_num += w * (_DELTA if not is_function_word(hyp[i]) else 1.0 - _DELTA)
            r_num += w * (_DELTA if not is_function_word(ref[j]) else 1.0 - _DELTA)
        p = p_num / _delta_mass(hyp)
        r = r_num / _delta_mass(ref)
        if p == 0.0 or r == 0.0:
            continue
        fmean = p * r / (_ALPHA * p + (1 - _ALPHA) * r)
        penalty = _GAMMA * (chunks / matches) ** _BETA
        best = max(best, fmean * (1.0 - penalty))
    return best


def meteor(refs: Dict[int, List[str]], hypos: Dict[int, List[str]]) -> float:
    scores = [meteor_sentence(hypos[i][0], refs[i]) for i in hypos]
    return sum(scores) / len(scores) if scores else 0.0

"""METEOR (native: exact + stem match modules, METEOR-1.5 parameters).

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
  * METEOR-1.5 English ranking parameters: alpha=0.85, beta=0.2,
    gamma=0.6; weighted precision/recall over module weights.

Remaining gaps vs the Java tool (documented, unverifiable without it):
the synonym (WordNet) and paraphrase (table) modules, and the
content/function-word weighting delta (every word is treated as a
content word). The reference's shipped results do not include METEOR
at all (BASELINE.md), so no parity target exists.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .porter import porter_stem

_ALPHA = 0.85
_BETA = 0.2
_GAMMA = 0.6
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


def _align(hyp: List[str], ref: List[str]) -> Tuple[int, int, float]:
    """Exact+stem METEOR alignment.

    Returns ``(matches, chunks, weighted_matches)`` for the alignment
    that maximizes matches, then minimizes chunks, then maximizes the
    module-weight sum.
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
        return 0, 0, 0.0

    best = [total + 1, -1.0]  # (min chunks, max weight at that chunk count)

    def dfs(i, matched, chunks, wsum, last_i, last_j):
        if chunks > best[0]:  # chunk count only grows
            return
        if chunks == best[0] and wsum + (total - matched) * _W_EXACT <= best[1]:
            return  # cannot beat the incumbent weight at equal chunks
        if matched == total:
            if chunks < best[0] or (chunks == best[0] and wsum > best[1]):
                best[0], best[1] = chunks, wsum
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
            dfs(i + 1, matched + 1, chunks + (0 if extend else 1),
                wsum + weight[(i, j)], i, j)
            right_alive[j] = True
        dfs(i + 1, matched, chunks, wsum, last_i, last_j)

    dfs(0, 0, 0, 0.0, -2, -2)
    return total, best[0], best[1]


def meteor_sentence(hypo: str, refs: List[str]) -> float:
    hyp = hypo.split()
    best = 0.0
    for ref_str in refs:
        ref = ref_str.split()
        if not hyp or not ref:
            continue
        matches, chunks, wsum = _align(hyp, ref)
        if matches == 0:
            continue
        p = wsum / len(hyp)
        r = wsum / len(ref)
        fmean = p * r / (_ALPHA * p + (1 - _ALPHA) * r)
        penalty = _GAMMA * (chunks / matches) ** _BETA
        best = max(best, fmean * (1.0 - penalty))
    return best


def meteor(refs: Dict[int, List[str]], hypos: Dict[int, List[str]]) -> float:
    scores = [meteor_sentence(hypos[i][0], refs[i]) for i in hypos]
    return sum(scores) / len(scores) if scores else 0.0

#!/usr/bin/env python
"""Host-side metric-kernel benchmark (the `calculate_a2cNetwork_score`
path, reference utilities.py:341-358).

Times each scorer over a 40k-pair corpus — the reference's shipped
caption dump when present (`--dump_dir`, default the reference mount),
else a synthetic corpus of the same shape — and reports native-C++ vs
pure-Python side by side. Regenerates the numbers recorded in
BENCHMARKS.md "Native metric kernels".

Usage: python benchmarks/bench_metrics.py [--pairs N] [--python]
(--python also times the pure-Python scorers; the METEOR one costs
~25 s at 40k pairs.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_captioning_through_rl_tpu.metrics.bleu import corpus_bleu
from image_captioning_through_rl_tpu.metrics.cider import cider
from image_captioning_through_rl_tpu.metrics.meteor import meteor_sentence
from image_captioning_through_rl_tpu.metrics.native import (
    cider_native,
    corpus_bleu_native,
    meteor_scores_native,
    rouge_scores_native,
)
from image_captioning_through_rl_tpu.metrics.rouge import rouge_l_sentence
from image_captioning_through_rl_tpu.metrics.score import load_textfiles

_DUMP_DIR = "/root/reference/models_pretrained/no_wemb"


def load_corpus(dump_dir: str, pairs: int):
    real = os.path.join(dump_dir, "real_captions_non-curr.txt")
    gen = os.path.join(dump_dir, "generated_captions_non-curr.txt")
    if os.path.exists(real) and os.path.exists(gen):
        refs, hypos = load_textfiles(real, gen)
        src = f"reference dump ({len(hypos)} pairs)"
    else:  # synthetic stand-in with caption-like statistics
        import numpy as np

        n = pairs or 40000  # synthetic needs SOME size; 0 = dump-sized
        rng = np.random.default_rng(0)
        words = [f"w{i}" for i in range(1000)] + list("a the of on in dog cat man".split())

        def sent():
            ln = int(rng.integers(5, 17))
            return " ".join(words[i] for i in rng.integers(0, len(words), ln))

        refs = {i: [sent()] for i in range(n)}
        hypos = {i: [sent()] for i in range(n)}
        src = f"synthetic corpus ({n} pairs)"
    if pairs and pairs < len(hypos):
        keep = list(hypos)[:pairs]
        refs = {i: refs[i] for i in keep}
        hypos = {i: hypos[i] for i in keep}
        src += f", truncated to {pairs}"
    return refs, hypos, src


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    val = out if isinstance(out, float) else None
    print(f"{label:<38} {dt:8.3f} s" + (f"   -> {val:.6f}" if val is not None else ""))
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump_dir", default=_DUMP_DIR)
    ap.add_argument("--pairs", type=int, default=0, help="truncate corpus (0 = all)")
    ap.add_argument("--python", action="store_true",
                    help="also time the pure-Python scorers (slow)")
    args = ap.parse_args()

    refs, hypos, src = load_corpus(args.dump_dir, args.pairs)
    print(f"corpus: {src}")

    mean = lambda xs: sum(xs) / len(xs) if xs else 0.0  # noqa: E731
    timed("BLEU_1..4 (native C++)", lambda: corpus_bleu_native(refs, hypos)[3])
    timed("CIDEr (native C++)", lambda: cider_native(refs, hypos))
    timed("ROUGE-L (native C++)", lambda: mean(rouge_scores_native(refs, hypos)))
    timed("METEOR exact+stem (native C++)", lambda: mean(meteor_scores_native(refs, hypos)))

    if args.python:
        timed("BLEU_1..4 (pure Python)", lambda: corpus_bleu(refs, hypos)[3])
        timed("CIDEr (pure Python)", lambda: cider(refs, hypos))
        timed("ROUGE-L (pure Python)", lambda: mean(
            [rouge_l_sentence(hypos[i][0], refs[i]) for i in hypos]))
        timed("METEOR (pure Python)", lambda: mean(
            [meteor_sentence(hypos[i][0], refs[i]) for i in hypos]))


if __name__ == "__main__":
    main()

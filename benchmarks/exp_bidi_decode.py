#!/usr/bin/env python
"""Experiment: bidirectional decode family — carried-state vs the
full-prefix re-encode (VERDICT r04 item 5 / weak #5).

Round 5 made the carried-state decode family exact for bidirectional
policies (models/policy.py: the backward direction's hidden at the
prefix's LAST position is one cell from the fixed backward initial
state, and decode reads only that position). Before this, bidirectional
serving re-encoded the whole prefix every step — O(T^2) with no
measurement of the gap. This harness measures it at COCO shapes, plus
the unidirectional carried decode as the structural floor.

Protocol (CLAUDE.md): single process, interleaved round-robin A/B,
per-variant minimum over rounds, windows >= 500 ms, host-readback sync
on a tiny dependent slice. Results land in BENCHMARKS.md round 5.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig
from image_captioning_through_rl_tpu.decode import (
    beam_search,
    beam_search_full_prefix,
    greedy_decode,
    greedy_decode_full_prefix,
    sample_decode,
    sample_decode_full_prefix,
)
from image_captioning_through_rl_tpu.models import policy, value

VOCAB, FEAT, HID, T = 1004, 512, 512, 17


def timed(fn, iters=8, warmup=6):
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0][:1])
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0][:1])
        dt = time.perf_counter() - t0
        if dt >= 0.5 or iters >= 2048:
            return dt / iters * 1e3
        iters = min(2048, max(iters * 2, int(iters * 0.6 / max(dt, 1e-3)) + 1))


def main():
    cfg_bi = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID,
                       hidden_dim=HID, max_seq_len=T, bidirectional=True)
    cfg_uni = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID,
                        hidden_dim=HID, max_seq_len=T)
    pp_bi = policy.init(jax.random.PRNGKey(0), cfg_bi)
    vp_bi = value.init(jax.random.PRNGKey(1), cfg_bi)
    pp_u = policy.init(jax.random.PRNGKey(0), cfg_uni)
    vp_u = value.init(jax.random.PRNGKey(1), cfg_uni)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(5)
    dcfg = DecodeConfig(beam_size=5, max_seq_len=T)

    def batch(n):
        f = jnp.asarray(rng.standard_normal((n, FEAT), dtype=np.float32))
        return f, jnp.ones((n,), jnp.int32)

    # jit wrappers with params as arguments (no closure constants)
    g_car = jax.jit(lambda p, c, f, s: greedy_decode(p, c, f, s),
                    static_argnums=1)
    g_full = jax.jit(lambda p, c, f, s: greedy_decode_full_prefix(p, c, f, s),
                     static_argnums=1)
    s_car = jax.jit(lambda p, c, f, s, k: sample_decode(
        p, c, f, s, k, temperature=0.9, top_k=8), static_argnums=1)
    s_full = jax.jit(lambda p, c, f, s, k: sample_decode_full_prefix(
        p, c, f, s, k, temperature=0.9, top_k=8), static_argnums=1)
    b_car = jax.jit(lambda p, v, c, f, s: beam_search(p, v, c, dcfg, f, s),
                    static_argnums=2)
    b_full = jax.jit(lambda p, v, c, f, s: beam_search_full_prefix(
        p, v, c, dcfg, f, s), static_argnums=2)

    # parity first (the switch's correctness contract, on this backend)
    f, s = batch(256)
    eq_g = np.array_equal(np.asarray(g_car(pp_bi, cfg_bi, f, s)),
                          np.asarray(g_full(pp_bi, cfg_bi, f, s)))
    eq_s = np.array_equal(np.asarray(s_car(pp_bi, cfg_bi, f, s, key)),
                          np.asarray(s_full(pp_bi, cfg_bi, f, s, key)))
    eq_b = np.array_equal(np.asarray(b_car(pp_bi, vp_bi, cfg_bi, f, s)[0]),
                          np.asarray(b_full(pp_bi, vp_bi, cfg_bi, f, s)[0]))
    print(f"parity n=256: greedy={eq_g} sample={eq_s} beam={eq_b}")

    rows = [
        ("greedy", 1024,
         lambda f, s: g_full(pp_bi, cfg_bi, f, s),
         lambda f, s: g_car(pp_bi, cfg_bi, f, s),
         lambda f, s: g_car(pp_u, cfg_uni, f, s)),
        ("greedy", 8192,
         lambda f, s: g_full(pp_bi, cfg_bi, f, s),
         lambda f, s: g_car(pp_bi, cfg_bi, f, s),
         lambda f, s: g_car(pp_u, cfg_uni, f, s)),
        ("sample top-k 8", 1024,
         lambda f, s: s_full(pp_bi, cfg_bi, f, s, key),
         lambda f, s: s_car(pp_bi, cfg_bi, f, s, key),
         lambda f, s: s_car(pp_u, cfg_uni, f, s, key)),
        ("beam-5", 127,
         lambda f, s: b_full(pp_bi, vp_bi, cfg_bi, f, s)[0],
         lambda f, s: b_car(pp_bi, vp_bi, cfg_bi, f, s)[0],
         lambda f, s: b_car(pp_u, vp_u, cfg_uni, f, s)[0]),
    ]
    for name, n, full_fn, car_fn, uni_fn in rows:
        f, s = batch(n)
        best = {"full": np.inf, "carried": np.inf, "uni": np.inf}
        for _ in range(3):  # interleaved rounds, per-variant minimum
            best["full"] = min(best["full"], timed(lambda: full_fn(f, s)))
            best["carried"] = min(best["carried"], timed(lambda: car_fn(f, s)))
            best["uni"] = min(best["uni"], timed(lambda: uni_fn(f, s)))
        print(f"{name:<16} n={n:<6} full-prefix {best['full']:8.2f} ms  "
              f"carried {best['carried']:8.2f} ms  -> {best['full']/best['carried']:.2f}x  "
              f"(uni floor {best['uni']:.2f} ms, "
              f"bidi/uni {best['carried']/best['uni']:.2f}x)")


if __name__ == "__main__":
    main()

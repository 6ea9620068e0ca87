#!/usr/bin/env python
"""Full benchmark suite: every hot path at production (COCO) scale.

Measures steady-state device time (host-readback sync, upload warmup —
see CLAUDE.md for the environment's timing gotchas) and writes the raw
table to benchmarks/MEASURED.md (BENCHMARKS.md is the curated record —
roofline, numerics analysis — and is maintained by hand). The headline
metric for the driver stays in ../bench.py.

Run: python benchmarks/bench_suite.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig  # noqa: E402
from image_captioning_through_rl_tpu.decode import beam_search, fused_greedy_decode, greedy_decode  # noqa: E402
from image_captioning_through_rl_tpu.models import a2c, policy, reward, value  # noqa: E402
from image_captioning_through_rl_tpu.train import optim, steps  # noqa: E402

VOCAB, FEAT, HID, T = 1004, 512, 512, 17


def timed(fn, n_items, iters, warmup=8):
    """ms/step and items/s over an async dispatch chain with a single
    trailing host readback. The chain carries ONE ~25 ms tunnel round
    trip regardless of length (BENCHMARKS.md "tunnel RTT floor"), so
    ``iters`` is auto-raised until the measured window is >= 500 ms,
    bounding the RTT bias at ~5%."""
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        dt = time.perf_counter() - t0
        if dt >= 0.5 or iters >= 2048:
            return dt / iters * 1e3, n_items * iters / dt  # (ms/step, items/s)
        iters = min(2048, max(iters * 2, int(iters * 0.6 / max(dt, 1e-3)) + 1))


def main(quick: bool = False) -> None:
    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID, hidden_dim=HID)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    iters = 5 if quick else 20

    def batch(n):
        feats = jnp.asarray(rng.standard_normal((n, FEAT), dtype=np.float32))
        caps = rng.integers(4, VOCAB, (n, T)).astype(np.int32)
        caps[:, 0] = 1
        caps[:, 12] = 2
        caps[:, 13:] = 0
        return feats, jnp.asarray(caps)

    rows = []

    def record(name, n, ms, rate, unit):
        rows.append((name, n, ms, rate, unit))
        print(f"{name:<42} N={n:<6} {ms:8.2f} ms/step  {rate:>12,.0f} {unit}")

    pparams = policy.init(jax.random.PRNGKey(1), cfg)
    vparams = value.init(jax.random.PRNGKey(2), cfg)
    rparams = reward.init(jax.random.PRNGKey(3), cfg)
    a2c_params = {"policy": pparams, "value": vparams}

    on_tpu = jax.devices()[0].platform != "cpu"

    # --- decode ---
    for n in ((1024,) if quick else (1024, 8192)):
        feats, caps = batch(n)
        start = caps[:, 0]
        g = jax.jit(lambda p, f, s: greedy_decode(p, cfg, f, s))
        ms, rate = timed(lambda: g(pparams, feats, start), n, iters)
        record("greedy decode (XLA scan)", n, ms, rate, "captions/s")
        if on_tpu:  # Mosaic kernels need the real backend
            ms, rate = timed(lambda: fused_greedy_decode(pparams, feats, start), n, iters)
            record("greedy decode (fused Pallas, bf16)", n, ms, rate, "captions/s")

    # sampling decode (framework-added mode): the serving-typical
    # temperature+top-k config; XLA pays a per-step lax.top_k, the
    # fused kernel a 32-step bisection threshold (ops/pallas_sample.py)
    from image_captioning_through_rl_tpu.decode import fused_sample_decode
    from image_captioning_through_rl_tpu.decode.sample import sample_decode

    for n in ((1024,) if quick else (1024, 8192)):
        feats, caps = batch(n)
        start = caps[:, 0]
        sfn = jax.jit(lambda p, f, s, k: sample_decode(
            p, cfg, f, s, k, temperature=jnp.float32(0.9), top_k=8))
        ms, rate = timed(lambda: sfn(pparams, feats, start, key), n, iters)
        record("sampling decode top-k 8 (XLA scan)", n, ms, rate, "captions/s")
        if on_tpu:
            ms, rate = timed(lambda: fused_sample_decode(
                pparams, feats, start, key, temperature=0.9, top_k=8), n, iters)
            record("sampling decode top-k 8 (fused Pallas, bf16)",
                   n, ms, rate, "captions/s")

    n = 127  # the eval slice width (quirk Q9)
    feats, caps = batch(n)
    dcfg = DecodeConfig(max_seq_len=T)
    bs = jax.jit(lambda pp, vp, f, s: beam_search(pp, vp, cfg, dcfg, f, s))
    ms, rate = timed(lambda: bs(pparams, vparams, feats, caps[:, 0]), n, iters)
    record("beam-5 value-guided decode (XLA)", n, ms, rate, "captions/s")
    if on_tpu:
        from image_captioning_through_rl_tpu.ops.pallas_beam import fused_beam_search

        ms, rate = timed(
            lambda: fused_beam_search(pparams, vparams, feats, caps[:, 0],
                                      max_len=T, beam=5, block_n=16)[0], n, iters)
        record("beam-5 fused Pallas kernel (block 16)", n, ms, rate, "captions/s")

    # --- training steps ---
    n = 512  # reference batch ("episodes", image_captioner.py:164)
    feats, caps = batch(n)

    tx = optim.adam(1e-3)
    popt = tx.init(pparams)
    for fused in (False, True) if on_tpu else (False,):
        pstep = steps.make_policy_step(cfg, tx, fused=fused)
        ms, rate = timed(lambda: pstep(pparams, popt, feats, caps), n, iters)
        record(f"policy XE step ({'fused chain' if fused else 'XLA'})",
               n, ms, rate, "captions/s")

    ropt = tx.init(rparams)
    for fused in (False, True) if on_tpu else (False,):
        rstep = steps.make_reward_step(cfg, tx, fused=fused)
        ms, rate = timed(lambda: rstep(rparams, ropt, feats, caps), n, iters)
        record(f"reward VSE step ({'fused chain' if fused else 'XLA'})",
               n, ms, rate, "pairs/s")

    vopt = tx.init(vparams)
    for fused in (False, True) if on_tpu else (False,):
        vstep = steps.make_value_step(cfg, tx, fused=fused)
        ms, rate = timed(
            lambda: vstep(vparams, vopt, pparams, rparams, feats, caps, 9), n, iters
        )
        record(f"value MSE step ({'fused' if fused else 'XLA'}, incl rollout)",
               n, ms, rate, "episodes/s")

    aopt = tx.init(a2c_params)
    for fused in (False, True) if on_tpu else (False,):
        astep = steps.make_a2c_step(cfg, tx, fused=fused)
        ms, rate = timed(
            lambda: astep(a2c_params, aopt, rparams, feats, caps, jnp.int32(1), key),
            n, iters,
        )
        record(f"A2C step ({'fused rollout' if fused else 'XLA'}, 16-step + BPTT)",
               n, ms, rate, "episodes/s")

    # --- chunked dispatch (k minibatch updates per jitted scan — the
    # default trainer path; amortizes the host round trip, which on a
    # tunneled chip otherwise dominates the 2-4 ms device step) ---
    k = 8
    feats_k = jnp.broadcast_to(feats, (k,) + feats.shape)
    caps_k = jnp.broadcast_to(caps, (k,) + caps.shape)
    inf = jnp.float32(np.inf)

    def timed_chunk(name, params0, chunk_call, iters_c=None, warmup=3):
        # 30 chained dispatches x k=8 steps: the single trailing ~25 ms
        # tunnel RTT then biases the per-step time by < 4%
        iters_c = iters_c or (2 if quick else 30)
        p = jax.tree.map(jnp.array, params0)
        o = tx.init(p)
        for _ in range(warmup):
            p, o, first = chunk_call(p, o)
        np.asarray(jax.tree.leaves(first)[0])
        t0 = time.perf_counter()
        for _ in range(iters_c):
            p, o, first = chunk_call(p, o)
        np.asarray(jax.tree.leaves(first)[0])
        dt = time.perf_counter() - t0
        record(name, n, dt / (iters_c * k) * 1e3, n * iters_c * k / dt,
               "captions/s" if "policy" in name else
               ("pairs/s" if "reward" in name else "episodes/s"))

    fused = on_tpu
    sfx = "fused" if fused else "XLA"
    pchunk = steps.make_policy_chunk_step(cfg, tx, fused=fused)
    timed_chunk(f"policy XE chunked k=8 ({sfx})", pparams,
                lambda p, o: pchunk(p, o, inf, feats_k, caps_k)[:3])
    rchunk = steps.make_reward_chunk_step(cfg, tx, fused=fused)
    timed_chunk(f"reward VSE chunked k=8 ({sfx})", rparams,
                lambda p, o: rchunk(p, o, inf, feats_k, caps_k)[:3])
    vchunk = steps.make_value_chunk_step(cfg, tx, fused=fused)
    plens = jnp.asarray(rng.integers(1, T, size=(k,)).astype(np.int32))
    timed_chunk(f"value MSE chunked k=8 ({sfx})", vparams,
                lambda p, o: vchunk(p, o, inf, pparams, rparams,
                                    feats_k, caps_k, plens)[:3])
    achunk = steps.make_a2c_chunk_step(cfg, tx, fused=fused)
    chunk_keys = jax.random.split(key, k)  # hoisted: splitting inside the
    # timed lambda adds a host dispatch per measured iteration
    timed_chunk(f"A2C chunked k=8 ({sfx} rollout)", a2c_params,
                lambda p, o: achunk(p, o, rparams, feats_k, caps_k,
                                    jnp.int32(1), chunk_keys)[:3])

    # write the raw table (BENCHMARKS.md is the curated record)
    out = os.path.join(os.path.dirname(__file__), "MEASURED.md")
    with open(out, "w") as f:
        f.write("# Measured rates (raw bench_suite output)\n\n")
        f.write(f"Device: {jax.devices()[0].device_kind}; COCO-bundle shapes "
                f"(vocab {VOCAB}, hidden {HID}, T {T}); float32 activations.\n"
                "Timing: steady-state, host-readback sync (see CLAUDE.md).\n\n")
        f.write("| Path | batch | ms/step | rate |\n|---|---|---|---|\n")
        for name, n, ms, rate, unit in rows:
            f.write(f"| {name} | {n} | {ms:.2f} | {rate:,.0f} {unit} |\n")
    print(f"\nwrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    main(ap.parse_args().quick)

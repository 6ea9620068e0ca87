"""Experiment: fused sampling with IN-KERNEL threefry Gumbel noise
(round 5) vs the XLA scan, across filter configs and batch sizes.

Round 4's kernel streamed a [steps*n, vocab] f32 Gumbel tensor from HBM,
which made PLAIN sampling a 0.28-0.80x loss and capped the fused path at
8192 rows. Round 5 recomputes each element's draw on the VPU from the
step subkey + flat counter (partitionable threefry, bit-exact vs
jax.random.gumbel) — this harness measures whether that flips plain
sampling and what the large-batch (ex-cap) picture looks like.

Protocol (CLAUDE.md): single process, interleaved round-robin A/B,
per-variant minimum over rounds; timing windows >= 500 ms via the
auto-raising timer. Scratch harness; results land in BENCHMARKS.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.decode.sample import sample_decode
from image_captioning_through_rl_tpu.ops.pallas_sample import (
    fused_sample_decode,
)

VOCAB, FEAT, HID, T = 1004, 512, 512, 17


def timed(fn, n_items, iters=8, warmup=8):
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0][:1, :1])
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0][:1, :1])
        dt = time.perf_counter() - t0
        if dt >= 0.5 or iters >= 2048:
            return dt / iters * 1e3, n_items * iters / dt
        iters = min(2048, max(iters * 2, int(iters * 0.6 / max(dt, 1e-3)) + 1))


def main():
    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID,
                    hidden_dim=HID)
    params = policy_init()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    configs = [
        ("plain", dict(temperature=0.9)),
        ("top-k 8", dict(temperature=0.9, top_k=8)),
        ("top-k 8 + top-p 0.9", dict(temperature=0.9, top_k=8,
                                     top_p=jnp.float32(0.9))),
    ]

    # --- on-chip token parity first (f32 resident weights) ---
    feats = jnp.asarray(rng.standard_normal((512, FEAT), dtype=np.float32))
    start = jnp.ones((512,), jnp.int32)
    for name, kw in configs:
        ref = np.asarray(jax.jit(
            lambda p, f, s, k: sample_decode(p, cfg, f, s, k, **kw)
        )(params, feats, start, key))
        got = np.asarray(fused_sample_decode(
            params, feats, start, key, max_len=T,
            weight_dtype=jnp.float32, **kw))
        n_div = int((got != ref).any(axis=1).sum())
        print(f"parity {name:<22}: {512 - n_div}/512 rows token-exact (f32)")

    # --- interleaved A/B, per-variant minimum over rounds ---
    # Control: the fused GREEDY kernel at the same shape is this kernel
    # minus noise + filters (same weight-stationary loop, same argmax),
    # so (plain fused) - (greedy fused) isolates what the in-kernel
    # threefry + Gumbel map cost, and (greedy fused) vs (plain XLA)
    # bounds what ANY fused sampler could hope for at that shape.
    from image_captioning_through_rl_tpu.ops.pallas_decode import (
        fused_greedy_decode,
    )

    ROUNDS = 3
    for n in (1024, 8192, 32768):
        feats = jnp.asarray(rng.standard_normal((n, FEAT), dtype=np.float32))
        start = jnp.ones((n,), jnp.int32)
        best_g = 1e30
        for _ in range(ROUNDS):
            ms, _ = timed(lambda: fused_greedy_decode(
                params, feats, start, max_len=T), n)
            best_g = min(best_g, ms)
        print(f"n={n:6d} {'greedy control':<22} fused {best_g:8.2f} ms "
              "(no noise, no filter)")
        for name, kw in configs:
            xla_jit = jax.jit(lambda p, f, s, k, kw=kw: sample_decode(
                p, cfg, f, s, k, **kw))
            best = {"xla": 1e30, "fused": 1e30}
            rate_at = {}
            for _ in range(ROUNDS):
                ms, rate = timed(lambda: xla_jit(params, feats, start, key), n)
                if ms < best["xla"]:
                    best["xla"], rate_at["xla"] = ms, rate
                try:
                    ms, rate = timed(lambda: fused_sample_decode(
                        params, feats, start, key, max_len=T, **kw), n)
                    if ms < best["fused"]:
                        best["fused"], rate_at["fused"] = ms, rate
                except Exception as e:
                    print(f"n={n:6d} {name:<22} fused FAIL "
                          f"{type(e).__name__} {str(e)[:100]}")
                    best["fused"] = float("nan")
                    break
            ratio = best["xla"] / best["fused"]
            print(f"n={n:6d} {name:<22} XLA {best['xla']:8.2f} ms  "
                  f"fused {best['fused']:8.2f} ms  -> fused {ratio:4.2f}x "
                  f"({rate_at.get('fused', float('nan')):,.0f} cap/s)")


def policy_init():
    from image_captioning_through_rl_tpu.models import policy

    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID,
                    hidden_dim=HID)
    return policy.init(jax.random.PRNGKey(0), cfg)


if __name__ == "__main__":
    main()

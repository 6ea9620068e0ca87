"""Experiment: fused greedy-decode tile / VMEM-budget / batch sweep.

Scratch harness for kernel tuning on the tunneled v5e; results land in
BENCHMARKS.md once confirmed. Not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.decode import fused_greedy_decode, greedy_decode
from image_captioning_through_rl_tpu.models import policy

VOCAB, FEAT, HID, T = 1004, 512, 512, 17


def timed(fn, n_items, iters=20, warmup=8):
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    return dt / iters * 1e3, n_items * iters / dt


def main():
    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID, hidden_dim=HID)
    params = policy.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    xla_jit = jax.jit(lambda p, f, s: greedy_decode(p, cfg, f, s))

    for n in (8192, 16384, 32768):
        feats = jnp.asarray(rng.standard_normal((n, FEAT), dtype=np.float32))
        start = jnp.ones((n,), jnp.int32)
        ms, rate = timed(lambda: xla_jit(params, feats, start), n)
        print(f"n={n:6d} XLA scan            : {ms:7.2f} ms  {rate:,.0f} cap/s")
        for block in (512, 1024, 2048):
            try:
                ms, rate = timed(
                    lambda: fused_greedy_decode(
                        params, feats, start, max_len=T, block_n=block
                    ),
                    n,
                )
                print(f"n={n:6d} fused block {block:5d}   : {ms:7.2f} ms  {rate:,.0f} cap/s")
            except Exception as e:
                print(f"n={n:6d} fused block {block:5d}   : FAIL {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()

"""Experiment: does int8 MXU pay on this v5e through XLA?

Feasibility probe for a quantized decode path: times the two matmul
shapes that dominate greedy decode (LSTM gate matmul and vocab head) in
bf16 vs int8 (``lax.dot_general`` with ``preferred_element_type=int32``)
and with the dynamic per-row activation-quantization overhead a real
quantized step would pay. Scratch harness; results land in
BENCHMARKS.md once confirmed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _sync(out):
    # sync with a TINY dependent-slice readback: the tunnel reads back
    # at ~50 MB/s, so np.asarray of a [32768,2048] output would swamp
    # the compute being measured by ~1000x
    np.asarray(jax.tree.leaves(out)[0][:1, :1])


def _window_ms(fn, iters):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _calibrate(fn, iters=20, warmup=10):
    for _ in range(warmup):
        out = fn()
    _sync(out)
    while True:
        dt = _window_ms(fn, iters) * iters / 1e3
        if dt >= 0.5 or iters >= 4096:
            return iters
        iters = min(4096, max(iters * 2, int(iters * 0.6 / max(dt, 1e-3)) + 1))


def timed_round_robin(variants, rounds=5):
    """CLAUDE.md A/B protocol: one process, interleaved round-robin
    windows, per-variant MINIMUM — a drift spike during one variant's
    window cannot flip the verdict. ``variants``: {name: fn}. Returns
    {name: ms}."""
    iters = {name: _calibrate(fn) for name, fn in variants.items()}
    best = {name: float("inf") for name in variants}
    for _ in range(rounds):
        for name, fn in variants.items():
            best[name] = min(best[name], _window_ms(fn, iters[name]))
    return best


def dot_i8(a, b):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def quant_rows(x):
    """Dynamic symmetric per-row activation quantization."""
    s = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("LSTM gates", 32768, 768, 2048),
        ("vocab head", 32768, 512, 1024),
    ]
    for name, m, k, n in shapes:
        a32 = rng.standard_normal((m, k)).astype(np.float32)
        b32 = rng.standard_normal((k, n)).astype(np.float32)
        a16 = jnp.asarray(a32, jnp.bfloat16)
        b16 = jnp.asarray(b32, jnp.bfloat16)
        a8 = jnp.asarray(np.clip(np.round(a32 * 40), -127, 127), jnp.int8)
        b8 = jnp.asarray(np.clip(np.round(b32 * 40), -127, 127), jnp.int8)
        af = jnp.asarray(a32)
        bscale = jnp.asarray(rng.random((1, n)), jnp.float32)

        f_bf16 = jax.jit(lambda a, b: jnp.dot(a, b,
                                              preferred_element_type=jnp.float32))
        f_i8 = jax.jit(dot_i8)

        def quant_dot(a, b, bs):
            q, s = quant_rows(a)
            return dot_i8(q, b).astype(jnp.float32) * s * bs

        f_qdot = jax.jit(quant_dot)

        gf = 2 * m * k * n / 1e9
        t = timed_round_robin({
            "bf16": lambda: f_bf16(a16, b16),
            "int8": lambda: f_i8(a8, b8),
            "qdot": lambda: f_qdot(af, b8, bscale),
        })
        print(f"{name}: [{m},{k}]x[{k},{n}]  {gf:.1f} GF")
        print(f"  bf16            : {t['bf16']:7.3f} ms  {gf / t['bf16'] * 1e3:7.0f} GF/s")
        print(f"  int8 (static)   : {t['int8']:7.3f} ms  {gf / t['int8'] * 1e3:7.0f} GF/s")
        print(f"  int8 + dyn quant: {t['qdot']:7.3f} ms  {gf / t['qdot'] * 1e3:7.0f} GF/s")


if __name__ == "__main__":
    main()

"""Experiment: fused A2C rollout block_n sweep (fwd-only and fwd+bwd).

Grad results are summed into the timed output so XLA cannot DCE the
backward kernels. Interleaved round-robin, per-variant minimum.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c, reward
from image_captioning_through_rl_tpu.train import steps

VOCAB, FEAT, HID, T = 1004, 512, 512, 17
N = 512


def main():
    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID, hidden_dim=HID)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    rparams = reward.init(jax.random.PRNGKey(1), cfg)
    key = jax.random.PRNGKey(7)
    rng = np.random.default_rng(0)
    k = 8
    feats = jnp.asarray(rng.standard_normal((k, N, FEAT), dtype=np.float32))
    caps = rng.integers(4, VOCAB, size=(k, N, T)).astype(np.int32)
    caps[:, :, 0] = 1
    caps[:, :, -1] = 2
    caps = jnp.asarray(caps)

    def loss_chunk(block):
        @jax.jit
        def f(p, rp, fs, cs, rng):
            keys = jax.random.split(rng, fs.shape[0])

            def body(carry, inp):
                fb, cb, kb = inp
                caplen = jnp.max(steps.batch_caption_lens(cb))
                loss, _ = steps.a2c_rollout_loss_fused(
                    p, cfg, rp, fb, cb, jnp.int32(1), caplen, kb, block_n=block
                )
                return carry + loss, None

            tot, _ = jax.lax.scan(body, jnp.float32(0), (fs, cs, keys))
            return tot
        return lambda: f(params, rparams, feats, caps, key)

    def grad_chunk(block):
        gf = jax.value_and_grad(
            functools.partial(steps.a2c_rollout_loss_fused, block_n=block),
            has_aux=True,
        )

        @jax.jit
        def f(p, rp, fs, cs, rng):
            keys = jax.random.split(rng, fs.shape[0])

            def body(carry, inp):
                fb, cb, kb = inp
                caplen = jnp.max(steps.batch_caption_lens(cb))
                (loss, _), g = gf(p, cfg, rp, fb, cb, jnp.int32(1), caplen, kb)
                gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
                return carry + loss + gsum, None

            tot, _ = jax.lax.scan(body, jnp.float32(0), (fs, cs, keys))
            return tot
        return lambda: f(params, rparams, feats, caps, key)

    runners = {}
    for block in (128, 256, 512):
        try:
            fn = loss_chunk(block)
            fn()
            runners[f"fwd  block {block}"] = fn
        except Exception as e:
            print(f"fwd  block {block}: FAIL {type(e).__name__} {str(e)[:100]}")
        try:
            fn = grad_chunk(block)
            fn()
            runners[f"grad block {block}"] = fn
        except Exception as e:
            print(f"grad block {block}: FAIL {type(e).__name__} {str(e)[:100]}")

    for name, fn in runners.items():
        for _ in range(4):
            out = fn()
        np.asarray(out)
    best = {name: float("inf") for name in runners}
    for _ in range(6):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            for _ in range(6):
                out = fn()
            np.asarray(out)
            best[name] = min(best[name], (time.perf_counter() - t0) / 6 * 1e3)
    for name in runners:
        ms = best[name] / k
        print(f"{name:16s}: {ms:6.2f} ms/minibatch  ({N / ms * 1e3:,.0f} eps/s)")


if __name__ == "__main__":
    main()

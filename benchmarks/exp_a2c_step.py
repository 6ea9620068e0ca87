"""Experiment: where does the chunked fused A2C step's time go?

Interleaved round-robin timing (tunnel drift), per-variant minimum:
  full           : production chunk step (fused rollout, Adam, stats)
  sgd            : Adam replaced by plain SGD (isolates Adam's cost)
  grad-only      : value_and_grad of the fused rollout loss, no update
  loss-only      : forward loss only (no backward)
  k=16           : production at chunk length 16 (dispatch amortization)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c, reward
from image_captioning_through_rl_tpu.train import optim, steps

VOCAB, FEAT, HID, T = 1004, 512, 512, 17
N = 512


def make_batch(k):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((k, N, FEAT), dtype=np.float32))
    caps = rng.integers(4, VOCAB, size=(k, N, T)).astype(np.int32)
    caps[:, :, 0] = 1
    caps[:, :, -1] = 2
    return feats, jnp.asarray(caps)


def main():
    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID, hidden_dim=HID)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    rparams = reward.init(jax.random.PRNGKey(1), cfg)
    key = jax.random.PRNGKey(7)
    k = 8
    feats, caps = make_batch(k)
    feats16, caps16 = make_batch(16)

    tx_adam = optim.adam(1e-4)
    tx_sgd = optax.sgd(1e-4)

    def chunk_runner(tx, chunk, f, c, kk):
        p = jax.tree.map(jnp.array, params)
        o = tx.init(p)
        state = {"p": p, "o": o}

        def run():
            state["p"], state["o"], stats, _ = chunk(
                state["p"], state["o"], rparams, f, c, jnp.int32(1), jax.random.split(key, kk)
            )
            return stats.loss
        return run, kk

    runners = {}
    run, kk = chunk_runner(tx_adam, steps.make_a2c_chunk_step(cfg, tx_adam, fused=True), feats, caps, k)
    runners["full k=8 (production)"] = (run, kk)
    run, kk = chunk_runner(tx_sgd, steps.make_a2c_chunk_step(cfg, tx_sgd, fused=True), feats, caps, k)
    runners["sgd k=8"] = (run, kk)
    run, kk = chunk_runner(
        tx_adam, steps.make_a2c_chunk_step(cfg, tx_adam, fused=True), feats16, caps16, 16
    )
    runners["full k=16"] = (run, kk)

    # grad-only / loss-only: scan k=8 minibatches, no optimizer update
    grad_fn = jax.value_and_grad(steps.a2c_rollout_loss_fused, has_aux=True)

    @jax.jit
    def grad_chunk(p, rp, f, c, rng):
        keys = jax.random.split(rng, f.shape[0])

        def body(carry, inp):
            fb, cb, kb = inp
            caplen = jnp.max(steps.batch_caption_lens(cb))
            (loss, _), g = grad_fn(p, cfg, rp, fb, cb, jnp.int32(1), caplen, kb)
            return carry + loss, g["policy"]["head"]["b"][0]

        tot, _ = jax.lax.scan(body, jnp.float32(0), (f, c, keys))
        return tot

    @jax.jit
    def loss_chunk(p, rp, f, c, rng):
        keys = jax.random.split(rng, f.shape[0])

        def body(carry, inp):
            fb, cb, kb = inp
            caplen = jnp.max(steps.batch_caption_lens(cb))
            loss, _ = steps.a2c_rollout_loss_fused(p, cfg, rp, fb, cb, jnp.int32(1), caplen, kb)
            return carry + loss, None

        tot, _ = jax.lax.scan(body, jnp.float32(0), (f, c, keys))
        return tot

    runners["grad-only k=8"] = (lambda: grad_chunk(params, rparams, feats, caps, key), k)
    runners["loss-only k=8"] = (lambda: loss_chunk(params, rparams, feats, caps, key), k)

    # XLA (non-fused) chunk for reference
    run, kk = chunk_runner(tx_adam, steps.make_a2c_chunk_step(cfg, tx_adam), feats, caps, k)
    runners["full k=8 XLA rollout"] = (run, kk)

    for name, (fn, _) in runners.items():
        for _ in range(4):
            out = fn()
        np.asarray(out)

    best = {name: float("inf") for name in runners}
    rounds, iters = 6, 6
    for _ in range(rounds):
        for name, (fn, _) in runners.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            np.asarray(out)
            best[name] = min(best[name], (time.perf_counter() - t0) / iters * 1e3)

    for name, (fn, kk) in runners.items():
        ms = best[name] / kk
        print(f"{name:24s}: {ms:6.2f} ms/step  ({N / ms * 1e3:,.0f} eps/s)")


if __name__ == "__main__":
    main()

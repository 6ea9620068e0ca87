"""Experiment: attribute the fused A2C *forward* (1.7 ms vs 0.61 ms
ideal) across the rollout kernel, the reward-stream kernel and glue.

Interleaved round-robin, per-variant minimum, k=8 minibatch scans.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c, reward
from image_captioning_through_rl_tpu.ops.pallas_rollout import (
    fused_reward_stream,
    fused_rollout,
)
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

    def scan_of(body_fn):
        @jax.jit
        def f(p, rp, fs, cs, rng):
            keys = jax.random.split(rng, fs.shape[0])

            def body(carry, inp):
                fb, cb, kb = inp
                out = body_fn(p, rp, fb, cb, kb)
                return carry + out, None

            tot, _ = jax.lax.scan(body, jnp.float32(0), (fs, cs, keys))
            return tot
        return lambda: f(params, rparams, feats, caps, key)

    def full_loss(p, rp, fb, cb, kb):
        caplen = jnp.max(steps.batch_caption_lens(cb))
        loss, _ = steps.a2c_rollout_loss_fused(p, cfg, rp, fb, cb, jnp.int32(1), caplen, kb)
        return loss

    def rollout_only(p, rp, fb, cb, kb):
        values, log_probs, actions, tokens = fused_rollout(
            p, cfg, fb, cb, jnp.int32(1), kb
        )
        return jnp.sum(values) + jnp.sum(log_probs) + jnp.sum(actions) + jnp.sum(tokens)

    def reward_only(p, rp, fb, cb, kb):
        # static token/action streams (shifted ground truth): isolates
        # the reward kernel's cost from the rollout that feeds it
        actions = cb[:, 1:]
        tokens = cb[:, :-1]
        r = fused_reward_stream(rp, cfg, fb, cb[:, 0], actions, tokens)
        return jnp.sum(r)

    def glue_only(p, rp, fb, cb, kb):
        # everything a2c_rollout_loss_fused does except the two kernels:
        # caplen, gumbel keys, masks, losses on dummy streams
        caplen = jnp.max(steps.batch_caption_lens(cb))
        s = T - 1
        values = jnp.cumsum(fb[:, :s], axis=1) * 1e-3
        rewards = fb[:, :s] * 1e-3
        log_probs = fb[:, s:2 * s] * 1e-3
        p_idx = jnp.arange(1, T)[None, :]
        mask = ((p_idx >= 1) & (p_idx <= caplen - 1)).astype(values.dtype)
        mask = jnp.broadcast_to(mask, values.shape)
        from image_captioning_through_rl_tpu.ops.losses import a2c_losses
        actor, critic = a2c_losses(values, rewards, log_probs, step_mask=mask)
        return actor + critic

    def empty_body(p, rp, fb, cb, kb):
        return jnp.sum(fb) * 1e-6

    def caplen_only(p, rp, fb, cb, kb):
        return jnp.max(steps.batch_caption_lens(cb)).astype(jnp.float32)

    def gumbel_only(p, rp, fb, cb, kb):
        s = T - 1
        keys = jax.random.split(kb, s)
        g = jax.vmap(lambda kk: jax.random.gumbel(kk, (N, VOCAB)))(keys)
        return jnp.sum(g) * 1e-6

    runners = {
        "full fused loss": scan_of(full_loss),
        "rollout kernel only": scan_of(rollout_only),
        "reward kernel only": scan_of(reward_only),
        "glue only": scan_of(glue_only),
        "empty body": scan_of(empty_body),
        "caplen only": scan_of(caplen_only),
        "gumbel stream only": scan_of(gumbel_only),
    }

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
        print(f"{name:22s}: {ms:6.3f} ms/minibatch")


if __name__ == "__main__":
    main()

"""A/B: round-3 rollout-kernel variants (reward fusion x gate tape).

Four chunked fused A2C steps (k=8, N=512, COCO shapes), interleaved
round-robin within one process with per-variant minimum (tunnel drift
protocol, CLAUDE.md):

  separate+tape   : round-2 production (separate reward program, full tape)
  fusedrew+tape   : reward GRU stream fused INTO the rollout kernel
  separate+recomp : gate tape dropped, backward recomputes gates
  fusedrew+recomp : both

Each variant also health-checks its loss against the XLA rollout.
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
from image_captioning_through_rl_tpu.train import optim, steps

VOCAB, FEAT, HID, T = 1004, 512, 512, 17
N = 512
K = 8

VARIANTS = {
    "separate+tape": dict(fuse_reward=False, tape_gates=True),
    "fusedrew+tape": dict(fuse_reward=True, tape_gates=True),
    "separate+recomp": dict(fuse_reward=False, tape_gates=False),
    "fusedrew+recomp": dict(fuse_reward=True, tape_gates=False),
    "xla-control": None,  # unfused chunk step: in-process drift anchor
}


def main():
    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID, hidden_dim=HID)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    rparams = reward.init(jax.random.PRNGKey(1), cfg)
    key = jax.random.PRNGKey(7)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((K, N, FEAT), dtype=np.float32))
    caps = rng.integers(4, VOCAB, size=(K, N, T)).astype(np.int32)
    caps[:, :, 0] = 1
    caps[:, :, -1] = 2
    caps = jnp.asarray(caps)
    keys = jax.random.split(key, K)
    tx = optim.adam(1e-4)
    orig = steps.a2c_rollout_loss_fused

    # XLA reference loss for health checks
    lx, _ = steps.a2c_rollout_loss(
        params, cfg, rparams, feats[0], caps[0], jnp.int32(1), jnp.int32(T),
        keys[0])
    lx = float(lx)

    runners = {}
    for name, kw in VARIANTS.items():
        if kw is None:
            chunk = steps.make_a2c_chunk_step(cfg, tx, fused=False)
            print(f"{name}: (unfused XLA rollout)", flush=True)
        else:
            steps.a2c_rollout_loss_fused = functools.partial(orig, **kw)
            chunk = steps.make_a2c_chunk_step(cfg, tx, fused=True)
            lf, _ = steps.a2c_rollout_loss_fused(
                params, cfg, rparams, feats[0], caps[0], jnp.int32(1), jnp.int32(T),
                keys[0])
            ok = abs(float(lf) - lx) <= 1e-2 * max(1.0, abs(lx))
            print(f"{name}: loss={float(lf):.6f} (xla {lx:.6f}) ok={ok}", flush=True)

        def make_run(chunk):
            state = {"p": jax.tree.map(jnp.array, params), "o": None}
            state["o"] = tx.init(state["p"])

            def run():
                state["p"], state["o"], stats, _ = chunk(
                    state["p"], state["o"], rparams, feats, caps,
                    jnp.int32(1), keys)
                return stats.loss

            return run

        runners[name] = make_run(chunk)
    steps.a2c_rollout_loss_fused = orig

    # warm: compile + program upload
    for name, run in runners.items():
        for _ in range(8):
            out = run()
        np.asarray(out)
        print(f"warmed {name}", flush=True)

    best = {name: float("inf") for name in runners}
    ROUNDS, ITERS = 5, 8  # 8 dispatches x k=8 steps per timed window
    for r in range(ROUNDS):
        for name, run in runners.items():
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = run()
            np.asarray(out)
            dt = (time.perf_counter() - t0) / (ITERS * K) * 1e3
            best[name] = min(best[name], dt)
    print("\nms/step (min over rounds, k=8 chunk, N=512):")
    for name, ms in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"  {name:18s} {ms:.3f} ms")


if __name__ == "__main__":
    main()

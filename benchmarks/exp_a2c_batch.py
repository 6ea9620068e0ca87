"""Batch scaling of the fused A2C step: episodes/s vs batch size.

The reference trains at 512 episodes/minibatch (its --batch_size
default); the fused step's serial 16-cell chain amortizes over batch
width, so throughput-mode users can trade minibatch size for
episodes/s. Interleaved round-robin within one process, per-size
minimum (tunnel drift protocol, CLAUDE.md); %SOL from
benchmarks/rooflines.py's analytic bound at each size.
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
from image_captioning_through_rl_tpu.train import optim, steps
from rooflines import MXU_BF16, HBM, path_a2c

VOCAB, FEAT, HID, T = 1004, 512, 512, 17
K = 8
SIZES = (512, 1024, 2048, 4096)


def main():
    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID, hidden_dim=HID)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    rparams = reward.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.PRNGKey(7), K)
    tx = optim.adam(1e-4)
    chunk = steps.make_a2c_chunk_step(cfg, tx, fused=True)

    runners = {}
    for n in SIZES:
        feats = jnp.asarray(rng.standard_normal((K, n, FEAT), dtype=np.float32))
        caps = rng.integers(4, VOCAB, size=(K, n, T)).astype(np.int32)
        caps[:, :, 0] = 1
        caps[:, :, -1] = 2
        caps = jnp.asarray(caps)

        def make_run(feats=feats, caps=caps):
            state = {"p": jax.tree.map(jnp.array, params), "o": None}
            state["o"] = tx.init(state["p"])

            def run():
                state["p"], state["o"], stats, _ = chunk(
                    state["p"], state["o"], rparams, feats, caps,
                    jnp.int32(1), keys)
                return stats.loss

            return run

        runners[n] = make_run()

    for n, run in runners.items():
        for _ in range(8):
            out = run()
        np.asarray(out)
        print(f"warmed N={n}", flush=True)

    best = {n: float("inf") for n in SIZES}
    ROUNDS = 5
    for _ in range(ROUNDS):
        for n, run in runners.items():
            iters = max(2, 8 * 512 // n)  # comparable window length
            t0 = time.perf_counter()
            for _ in range(iters):
                out = run()
            np.asarray(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / (iters * K) * 1e3)

    print("\nfused A2C chunk step (k=8), batch scaling:")
    print(f"{'N':>6} {'ms/step':>9} {'episodes/s':>12} {'SOL ms':>8} {'%SOL':>6}")
    for n in SIZES:
        flops, hbm = path_a2c(n)
        sol = max(flops / MXU_BF16, hbm / HBM) * 1e3
        print(f"{n:>6} {best[n]:9.2f} {n / best[n] * 1e3:12,.0f} "
              f"{sol:8.2f} {100 * sol / best[n]:5.0f}%")


if __name__ == "__main__":
    main()

"""A/B: is the pretrainer-chain %SOL plateau structural? (round 4)

Round 3 proved the A2C 56%-of-SOL plateau structural with a variant
sweep (exp_a2c_variants.py, BENCHMARKS.md); the policy-XE (52%) and
reward-VSE (49%) fused chains only inherited that conclusion by
analogy. This harness applies the same standard of evidence to both:

  * tile-shape variants: fused chain block_n 128 (production) / 256 /
    512;
  * precision variant: resident weights f32 instead of bf16 (halved
    MXU rate but no cast path — separates cast cost from chain
    latency);
  * chain-restructure decomposition: the fused forward chain ALONE
    (no grad), the full value_and_grad loss, and the XLA head+loss on
    precomputed states — attributing the step between the serial
    recurrent chain, its backward, and the batched head;
  * xla-control: the unfused chunk step, as the in-process drift
    anchor.

Protocol (CLAUDE.md tunnel rules): chunked k=8 dispatches @N=512 COCO
shapes, interleaved round-robin within ONE process, per-variant
minimum over rounds, >=500 ms timing windows, loss health-checked
against the XLA step.
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
from image_captioning_through_rl_tpu.models import policy, reward
from image_captioning_through_rl_tpu.ops.linalg import dense
from image_captioning_through_rl_tpu.ops.losses import weighted_caption_xe_loss
from image_captioning_through_rl_tpu.train import optim, steps

VOCAB, FEAT, HID, T = 1004, 512, 512, 17
N, K = 512, 8

VARIANTS = {  # (block_n, weight_dtype) for the fused chain; None = XLA
    "fused b128 bf16 (prod)": (128, jnp.bfloat16),
    "fused b256 bf16": (256, jnp.bfloat16),
    "fused b512 bf16": (512, jnp.bfloat16),
    "fused b128 f32": (128, jnp.float32),
    "xla-control": None,
}


def bench_interleaved(runners, rounds=5, min_window=0.5):
    """Windows are sized per-variant to >= ``min_window`` seconds: the
    tunnel's ~25 ms per-window round trip otherwise inflates short
    paths (a 0.3 ms/step component in a 64-step window "measures"
    0.7 ms) — the CLAUDE.md rule bench_suite.timed also enforces."""
    best = {name: float("inf") for name in runners}
    iters = {}
    for name, run in runners.items():
        for _ in range(8):
            out = run()
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(4):
            out = run()
        np.asarray(jax.tree.leaves(out)[0])
        per_call = (time.perf_counter() - t0) / 4
        iters[name] = max(8, int(np.ceil(min_window / max(per_call, 1e-9))))
        print(f"warmed {name} ({iters[name]} calls/window)", flush=True)
    for _ in range(rounds):
        for name, run in runners.items():
            it = iters[name]
            t0 = time.perf_counter()
            for _ in range(it):
                out = run()
            np.asarray(jax.tree.leaves(out)[0])
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / (it * K) * 1e3)
    return best


def report(title, best):
    print(f"\n{title} — ms/step (min over rounds, k={K} chunk, N={N}):")
    for name, ms in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"  {name:24s} {ms:.3f} ms")


def main():
    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID,
                    hidden_dim=HID)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((K, N, FEAT), dtype=np.float32))
    caps = rng.integers(4, VOCAB, size=(K, N, T)).astype(np.int32)
    caps[:, :, 0] = 1
    caps[:, :, 12] = 2
    caps[:, :, 13:] = 0
    caps = jnp.asarray(caps)
    inf = jnp.float32(np.inf)
    tx = optim.adam(1e-3)

    pparams = policy.init(jax.random.PRNGKey(1), cfg)
    rparams = reward.init(jax.random.PRNGKey(3), cfg)

    # ---------------- policy XE ----------------
    orig_p = steps.policy_loss_fused
    lx = float(steps.policy_loss(pparams, cfg, feats[0], caps[0],
                                 steps.batch_caption_lens(caps[0])))
    runners = {}
    for name, kw in VARIANTS.items():
        if kw is None:
            chunk = steps.make_policy_chunk_step(cfg, tx, fused=False)
        else:
            steps.policy_loss_fused = functools.partial(
                orig_p, block_n=kw[0], weight_dtype=kw[1])
            chunk = steps.make_policy_chunk_step(cfg, tx, fused=True)
            lf = float(steps.policy_loss_fused(
                pparams, cfg, feats[0], caps[0],
                steps.batch_caption_lens(caps[0])))
            ok = abs(lf - lx) <= 1e-2 * max(1.0, abs(lx))
            print(f"policy {name}: loss={lf:.6f} (xla {lx:.6f}) ok={ok}",
                  flush=True)

        def make_run(chunk):
            state = {"p": jax.tree.map(jnp.array, pparams), "o": None}
            state["o"] = tx.init(state["p"])

            def run():
                state["p"], state["o"], losses, *_ = chunk(
                    state["p"], state["o"], inf, feats, caps)
                return losses

            return run

        runners[name] = make_run(chunk)
    steps.policy_loss_fused = orig_p
    report("policy XE", bench_interleaved(runners))

    # decomposition: chain fwd alone / full loss+grad / head+XE on
    # precomputed states — one jitted fn each, k-amortized via a scan
    # whose carry feeds a ~1e-20-scaled perturbation back into an input
    # (a loop-INVARIANT body would be hoisted/CSE'd by XLA and measure
    # one call, not K). Params/data travel as jit ARGUMENTS (closure
    # constants bloat the remote-compile payload, CLAUDE.md).
    from image_captioning_through_rl_tpu.ops.pallas_lstm import fused_lstm_chain

    caplens = steps.batch_caption_lens(caps[0])
    h0 = dense(feats[0], pparams["cnn2linear"], precision=cfg.precision)
    hs0 = fused_lstm_chain(pparams["lstm"], pparams["embedding"],
                           caps[0, :, :-1], h0, jnp.zeros_like(h0))

    def touch_grads(loss_and_grad):
        # Keep the backward LIVE: summing every grad leaf into the
        # returned scalar (at 1e-30 it cannot perturb the timing carry)
        # stops XLA from dead-code-eliminating the whole VJP — without
        # this, "full loss grad" silently measures forward-only.
        loss, grads = loss_and_grad
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)) * 1e-30

    def make_scan(f, *args):
        @jax.jit
        def run(*a):
            def body(c, _):
                return f(c, *a) * 1e-20, ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c

        return lambda: run(*args)

    comp = {
        "chain fwd only": make_scan(
            lambda c, pp, f0, tk: fused_lstm_chain(
                pp["lstm"], pp["embedding"], tk,
                dense(f0, pp["cnn2linear"], precision=cfg.precision) + c,
                jnp.zeros((N, HID), jnp.float32))[0, -1, 0],
            pparams, feats[0], caps[0, :, :-1]),
        "full loss grad": make_scan(
            lambda c, pp, f0, cp, cl: touch_grads(jax.value_and_grad(
                steps.policy_loss_fused)(pp, cfg, f0 + c, cp, cl)),
            pparams, feats[0], caps[0], caplens),
        "head+XE on states": make_scan(
            lambda c, pp, hs, cp, cl: weighted_caption_xe_loss(
                dense(hs + c, pp["head"], precision=cfg.precision),
                cp[:, 1:], cl),
            pparams, hs0, caps[0], caplens),
    }
    report("policy XE decomposition", bench_interleaved(comp))

    # ---------------- reward VSE ----------------
    orig_r = steps.reward_loss_fused
    lx = float(steps.reward_loss(rparams, cfg, feats[0], caps[0]))
    runners = {}
    for name, kw in VARIANTS.items():
        if kw is None:
            chunk = steps.make_reward_chunk_step(cfg, tx, fused=False)
        else:
            steps.reward_loss_fused = functools.partial(
                orig_r, block_n=kw[0], weight_dtype=kw[1])
            chunk = steps.make_reward_chunk_step(cfg, tx, fused=True)
            lf = float(steps.reward_loss_fused(rparams, cfg, feats[0], caps[0]))
            ok = abs(lf - lx) <= 1e-2 * max(1.0, abs(lx))
            print(f"reward {name}: loss={lf:.6f} (xla {lx:.6f}) ok={ok}",
                  flush=True)

        def make_run(chunk):
            state = {"p": jax.tree.map(jnp.array, rparams), "o": None}
            state["o"] = tx.init(state["p"])

            def run():
                state["p"], state["o"], losses, *_ = chunk(
                    state["p"], state["o"], inf, feats, caps)
                return losses

            return run

        runners[name] = make_run(chunk)
    steps.reward_loss_fused = orig_r
    report("reward VSE", bench_interleaved(runners))

    from image_captioning_through_rl_tpu.ops.pallas_gru import fused_gru_chain
    from image_captioning_through_rl_tpu.models import reward as reward_mod
    from image_captioning_through_rl_tpu.ops.losses import (
        visual_semantic_embedding_loss)

    hlast = fused_gru_chain(rparams["gru"], rparams["embedding"], caps[0],
                            jnp.zeros((N, HID), jnp.float32))[:, -1]

    def gru_fwd(c, rp, cp):
        h0r = jnp.zeros((N, HID), jnp.float32) + c
        return fused_gru_chain(rp["gru"], rp["embedding"], cp, h0r)[0, -1, 0]

    comp = {
        "chain fwd only": make_scan(gru_fwd, rparams, caps[0]),
        "full loss grad": make_scan(
            lambda c, rp, f0, cp: touch_grads(jax.value_and_grad(
                steps.reward_loss_fused)(rp, cfg, f0 + c, cp)),
            rparams, feats[0], caps[0]),
        "embed+VSE on state": make_scan(
            lambda c, rp, f0, hl: visual_semantic_embedding_loss(
                *reward_mod.embed_pair(rp, cfg, f0 + c, hl),
                precision=cfg.precision),
            rparams, feats[0], hlast),
    }
    report("reward VSE decomposition", bench_interleaved(comp))


if __name__ == "__main__":
    main()

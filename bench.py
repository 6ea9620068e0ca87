#!/usr/bin/env python
"""Headline benchmark: greedy-decode captions/sec/chip vs PyTorch-CPU.

Measures the framework's jitted O(T) greedy decode (COCO-bundle shapes:
vocab 1004, hidden 512, T 17) on the default JAX device, against the
reference implementation's decode path — an O(T^2) full-prefix
``nn.LSTM`` re-encode loop in eager PyTorch on CPU (reference
trainers.py:57-70) — which is the baseline named in BASELINE.json
("PyTorch-CPU captions/sec on COCO val greedy decode").

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "captions/sec/chip", "vs_baseline": N}

The line also carries a ``paths`` sub-dict so a round-over-round move in
the headline is attributable to the path that moved (measured envelope
~0.2-1.7%/path across fresh processes under this protocol —
BENCHMARKS.md "per-path drift envelope"):
decode paths (``greedy_xla``/``greedy_fused`` @32768, ``beam5_fused``
@1024, ``sample_plain_xla``/``sample_filtered_fused`` @8192) in
captions/s; training paths (``policy_step``/``reward_step``/
``value_step``/``a2c_step``, chunked k=16 @512) in steps/s. Every path
uses the same best-of-3-windows protocol with >=500 ms windows. Health
fields: ``fused_ok`` (TPU kernel parity checks), ``fused_grads_ok``
(hand-written VJPs vs autodiff), ``fastmetrics_ok`` (native C++ metric
kernels tie the pure-Python scorers at 1e-12).
"""

import json
import time

import numpy as np

VOCAB = 1004
FEAT = 512
HID = 512
T = 17
JAX_BATCH = 32768
TORCH_BATCH = 128


def bench_jax():
    """Best of the XLA-scan path and the fused Pallas kernel, plus the
    compiled-kernel health checks (the production bf16 greedy AND
    filtered-sampling kernels token-equal to their XLA scans on trained
    weights; beam kernel runs; fused training losses AND gradients
    agree with XLA) so Mosaic
    regressions surface in the driver's bench artifact instead of
    silently falling back. Returns ``(paths, fused_ok, grads_ok)`` —
    ``paths`` is the per-decode-path rate dict (captions/s); main()
    derives the headline from its greedy entries."""
    import sys

    import jax
    import jax.numpy as jnp

    from image_captioning_through_rl_tpu.config import NetConfig
    from image_captioning_through_rl_tpu.decode import fused_greedy_decode, greedy_decode
    from image_captioning_through_rl_tpu.models import policy, value

    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID, hidden_dim=HID)
    params = policy.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((JAX_BATCH, FEAT), dtype=np.float32))
    start = jnp.ones((JAX_BATCH,), jnp.int32)

    # params as jit arguments: closures embed them as program constants
    xla_jit = jax.jit(lambda p, f, s: greedy_decode(p, cfg, f, s))
    xla_fn = lambda f, s: xla_jit(params, f, s)  # noqa: E731
    fused_fn = lambda f, s: fused_greedy_decode(params, f, s, max_len=T)  # noqa: E731

    def rate(fn, n_items, iters=None, windows=3):
        # sync via host readback: on tunneled backends block_until_ready
        # can return before device execution completes. Warm several
        # calls: the first post-compile round also pays a one-time
        # program-upload cost. Best of several >=500 ms windows — the
        # repo's measured methodology (per-variant minimum time): a
        # single window inherits whatever tunnel/queue stall it lands
        # on, which is most of the ±20-40% round-to-round drift.
        for _ in range(6):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        if iters is None:
            # size the window off a chained 8-call probe (one trailing
            # ~25 ms tunnel RTT amortized over the chain)
            t0 = time.perf_counter()
            for _ in range(8):
                out = fn()
            np.asarray(jax.tree.leaves(out)[0])
            per = max((time.perf_counter() - t0) / 8, 1e-4)
            iters = max(8, int(0.6 / per) + 1)
        best = 0.0
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            np.asarray(jax.tree.leaves(out)[0])
            best = max(best, n_items * iters / (time.perf_counter() - t0))
        return best

    paths = {"greedy_xla": rate(lambda: xla_fn(feats, start), JAX_BATCH, iters=25)}
    on_tpu = jax.devices()[0].platform != "cpu"

    # sampling, plain (XLA is the production default for unfiltered
    # requests — api.py dispatch policy) at the serving batch
    from image_captioning_through_rl_tpu.decode.sample import sample_decode

    s_n = 8192
    s_feats, s_start = feats[:s_n], start[:s_n]
    skey0 = jax.random.PRNGKey(5)
    plain_jit = jax.jit(lambda p, f, s, k: sample_decode(
        p, cfg, f, s, k, max_len=T, temperature=0.9))
    paths["sample_plain_xla"] = rate(
        lambda: plain_jit(params, s_feats, s_start, skey0), s_n)

    fused_ok = False
    try:
        paths["greedy_fused"] = rate(lambda: fused_fn(feats, start), JAX_BATCH,
                                     iters=25)
        # sampling, filtered (fused kernel is the production default
        # behind verified dispatch) and the fused beam-5 eval path
        from image_captioning_through_rl_tpu.ops.pallas_sample import (
            fused_sample_decode)

        paths["sample_filtered_fused"] = rate(
            lambda: fused_sample_decode(
                params, s_feats, s_start, skey0, max_len=T, temperature=0.9,
                top_k=8, top_p=0.9), s_n)
        from image_captioning_through_rl_tpu.ops.pallas_beam import fused_beam_search

        vparams = value.init(jax.random.PRNGKey(1), cfg)
        b_n = 1024
        paths["beam5_fused"] = rate(
            lambda: fused_beam_search(params, vparams, feats[:b_n],
                                      start[:b_n], max_len=T, beam=5,
                                      block_n=0)[0], b_n)
        # Health check 1: token-exact greedy agreement on briefly-
        # trained weights between the PRODUCTION-DEFAULT fused kernel
        # (bf16-resident weights — the path serving actually runs) and
        # the XLA scan. Trained (peaked) logits are the operating
        # regime; random weights are near-tie noise where XLA's own
        # default-vs-highest precision flips ~12% of captions, so
        # exactness is only defined for trained weights.
        from image_captioning_through_rl_tpu.train import steps as train_steps
        from image_captioning_through_rl_tpu.train.optim import adam

        caps = rng.integers(4, VOCAB, size=(512, T)).astype(np.int32)
        caps[:, 0] = 1
        caps[:, -1] = 2
        caps_d = jnp.asarray(caps)
        tparams = params
        tx = adam(1e-3, tparams, False)
        opt = tx.init(tparams)
        pstep = train_steps.make_policy_step(cfg, tx)
        for _ in range(150):
            tparams, opt, _ = pstep(tparams, opt, feats[:512], caps_d)
        n_chk = 1024
        chk_f, chk_s = feats[:n_chk], start[:n_chk]
        ftoks = np.asarray(fused_greedy_decode(tparams, chk_f, chk_s, max_len=T))
        xtoks = np.asarray(xla_jit(tparams, chk_f, chk_s))
        greedy_exact = bool(np.array_equal(ftoks, xtoks))
        # Health check 2: the fused SAMPLING kernel (production bf16,
        # the default for filtered requests via verified dispatch)
        # token-equal to the XLA sampling scan at the same key. The
        # O(1) Gumbel noise swamps cross-compiler matmul rounding at
        # the argmax, so unlike greedy this match is exact even off
        # the trained-weight regime; check it where serving runs.
        from image_captioning_through_rl_tpu.decode.sample import sample_decode
        from image_captioning_through_rl_tpu.ops.pallas_sample import (
            fused_sample_decode)

        sample_jit = jax.jit(lambda p, f, s, k: sample_decode(
            p, cfg, f, s, k, max_len=T, temperature=0.9, top_k=8,
            top_p=0.9))
        # The match is exact unless one of the ~16k draws lands a top-2
        # (logit+Gumbel) gap inside the ~1e-5 cross-compiler matmul
        # noise — a per-key coin flip, not a kernel property. A real
        # kernel regression mismatches under EVERY key, so retry with
        # fresh keys: false-red probability drops to p^3 while
        # systematic breakage still fails all three.
        sample_exact = False
        for attempt in range(3):
            skey = jax.random.PRNGKey(11 + attempt)
            stoks_x = np.asarray(sample_jit(tparams, chk_f, chk_s, skey))
            stoks_f = np.asarray(fused_sample_decode(
                tparams, chk_f, chk_s, skey, max_len=T, temperature=0.9,
                top_k=8, top_p=0.9))
            sample_exact = bool(np.array_equal(stoks_f, stoks_x))
            if sample_exact:
                break
            print(f"[bench] sampling canary key {11 + attempt}: "
                  f"{(stoks_f != stoks_x).any(axis=-1).sum()} rows diverged",
                  file=sys.stderr)
        # Health check 3: the fused beam kernel compiles and runs
        btoks, _ = fused_beam_search(
            tparams, vparams, feats[:127], start[:127], max_len=T, beam=5, block_n=0
        )
        beam_ran = np.asarray(btoks).shape == (127, 5, T)
        # Health check 4: the fused training-chain kernels agree with
        # their XLA twins on the loss (policy LSTM chain, reward GRU
        # chain) — compiled, on this chip, trained-ish weights.
        from image_captioning_through_rl_tpu.models import reward as reward_mod

        caplens = train_steps.batch_caption_lens(caps_d)
        lp_f, gp_f = jax.value_and_grad(train_steps.policy_loss_fused)(
            tparams, cfg, feats[:512], caps_d, caplens)
        lp_x, gp_x = jax.value_and_grad(train_steps.policy_loss)(
            tparams, cfg, feats[:512], caps_d, caplens)
        rw = reward_mod.init(jax.random.PRNGKey(2), cfg)
        lr_f, gr_f = jax.value_and_grad(train_steps.reward_loss_fused)(
            rw, cfg, feats[:512], caps_d)
        lr_x, gr_x = jax.value_and_grad(train_steps.reward_loss)(
            rw, cfg, feats[:512], caps_d)
        lp_f, lp_x, lr_f, lr_x = (float(x) for x in (lp_f, lp_x, lr_f, lr_x))
        chains_ok = (
            abs(lp_f - lp_x) <= 1e-2 * max(1.0, abs(lp_x))
            and abs(lr_f - lr_x) <= 1e-2 * max(1.0, abs(lr_x))
        )
        # Health check 5: GRADIENT fingerprints of the fused training
        # kernels' hand-written VJPs vs XLA autodiff (per-leaf cosine +
        # norm ratio) — a backward-kernel regression that preserves the
        # forward loss must fail the bench, not silently corrupt
        # training. Covers the policy XE chain, reward GRU chain, and
        # the full fused A2C rollout.
        from image_captioning_through_rl_tpu.train.loops import _grads_agree

        aparams = {"policy": tparams, "value": vparams}
        roll_args = (cfg, rw, feats[:512], caps_d, jnp.int32(1),
                     jnp.int32(T), jax.random.PRNGKey(3))
        (_, _), ga_f = jax.value_and_grad(
            train_steps.a2c_rollout_loss_fused, has_aux=True)(aparams, *roll_args)
        (_, _), ga_x = jax.value_and_grad(
            train_steps.a2c_rollout_loss, has_aux=True)(aparams, *roll_args)
        grads_ok = (
            _grads_agree(gp_f, gp_x)
            and _grads_agree(gr_f, gr_x)
            and _grads_agree(ga_f, ga_x)
        )
        fused_ok = (greedy_exact and sample_exact and beam_ran
                    and chains_ok and grads_ok)
        if not fused_ok:
            print(f"[bench] fused check failed: greedy_exact={greedy_exact} "
                  f"sample_exact={sample_exact} beam_ran={beam_ran} "
                  f"chains_ok={chains_ok} grads_ok={grads_ok}",
                  file=sys.stderr)
    except Exception as e:  # Mosaic needs a real TPU; report, don't mask
        print(f"[bench] fused kernels unavailable ({type(e).__name__}: {e}); "
              f"on_tpu={on_tpu}", file=sys.stderr)
        fused_ok = False
        grads_ok = False
    return paths, fused_ok, grads_ok


def bench_torch_cpu() -> float:
    """Reference-equivalent greedy decode in eager torch on CPU."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    emb = nn.Embedding(VOCAB, HID)
    cnn2linear = nn.Linear(FEAT, HID)
    lstm = nn.LSTM(HID, HID, batch_first=True)
    head = nn.Linear(HID, VOCAB)

    feats = torch.randn(1, TORCH_BATCH, FEAT)

    def decode_once():
        # the reference's loop: re-run the policy over the whole prefix
        # per generated token (trainers.py:65-70)
        with torch.no_grad():
            h0 = cnn2linear(feats)
            caps = torch.ones(TORCH_BATCH, 1, dtype=torch.long)
            for _ in range(T - 1):
                x = emb(caps)
                out, _ = lstm(x, (h0, torch.zeros_like(h0)))
                logits = head(out[:, -1:, :])
                caps = torch.cat((caps, logits.argmax(axis=2)), axis=1)
        return caps

    decode_once()  # warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        decode_once()
    dt = time.perf_counter() - t0
    return TORCH_BATCH * iters / dt


def bench_train_paths() -> dict:
    """Training steps/sec at 512 episodes for the four production
    training paths — policy XE, reward VSE, value MSE, A2C — each on
    its actual default dispatch: k=16 minibatch updates per jitted scan
    (steps.make_*_chunk_step, the trainers' chunk_steps default) over
    the fused Pallas chains when the backend lowers them (TPU), else
    the XLA twins. ``a2c_step`` is BASELINE's second metric ('A2C step
    time at speed-of-light on one v5e'). Chained dispatches with one
    trailing readback keep the tunnel's ~25 ms round trip below 1% of
    the window; best of 3 windows, like the decode rate()."""
    import jax
    import jax.numpy as jnp

    from image_captioning_through_rl_tpu.config import NetConfig
    from image_captioning_through_rl_tpu.models import a2c, reward
    from image_captioning_through_rl_tpu.train import optim, steps

    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID, hidden_dim=HID)
    aparams = a2c.init(jax.random.PRNGKey(0), cfg)
    rparams = reward.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    k = 16  # the trainers' default chunk length (loops.py chunk_steps)
    feats = jnp.asarray(rng.standard_normal((k, 512, FEAT), dtype=np.float32))
    caps = rng.integers(4, VOCAB, size=(k, 512, T)).astype(np.int32)
    caps[:, :, 0] = 1
    caps[:, :, -1] = 2
    caps = jnp.asarray(caps)
    tx = optim.adam(1e-4)
    keys = jax.random.split(jax.random.PRNGKey(7), k)  # per-minibatch keys
    plens = jnp.asarray(rng.integers(1, T, size=(k,)).astype(np.int32))
    inf = jnp.float32(np.inf)

    def measure(params0, call, iters=25):
        # the chunk donates params/opt: thread them like the trainer does
        p = jax.tree.map(jnp.array, params0)
        o = tx.init(p)
        for _ in range(6):
            p, o, sync = call(p, o)
        np.asarray(jax.tree.leaves(sync)[0])
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                p, o, sync = call(p, o)
            np.asarray(jax.tree.leaves(sync)[0])
            best = max(best, iters * k / (time.perf_counter() - t0))
        return best

    def try_fused(make, params0, mk_call):
        try:  # fused chains need Mosaic (real TPU); fall back to XLA
            return measure(params0, mk_call(make(True)))
        except Exception:
            return measure(params0, mk_call(make(False)))

    return {
        "policy_step": try_fused(
            lambda f: steps.make_policy_chunk_step(cfg, tx, fused=f),
            aparams["policy"],
            lambda c: lambda p, o: c(p, o, inf, feats, caps)[:3]),
        "reward_step": try_fused(
            lambda f: steps.make_reward_chunk_step(cfg, tx, fused=f),
            rparams,
            lambda c: lambda p, o: c(p, o, inf, feats, caps)[:3]),
        "value_step": try_fused(
            lambda f: steps.make_value_chunk_step(cfg, tx, fused=f),
            aparams["value"],
            lambda c: lambda p, o: c(p, o, inf, aparams["policy"], rparams,
                                     feats, caps, plens)[:3]),
        "a2c_step": try_fused(
            lambda f: steps.make_a2c_chunk_step(cfg, tx, fused=f),
            aparams,
            lambda c: lambda p, o: c(p, o, rparams, feats, caps,
                                     jnp.int32(1), keys)[:3]),
    }


def bench_fastmetrics() -> bool:
    """Native C++ metric kernels (native/fastmetrics.cpp) vs the pure-
    Python scorers on a synthetic corpus — the golden tie the suite
    proves (tests/test_native_metrics.py), witnessed in the driver's
    bench artifact so a silent native->Python fallback (or a numerics
    drift) surfaces as ``fastmetrics_ok: false``."""
    import sys

    from image_captioning_through_rl_tpu.metrics.bleu import corpus_bleu
    from image_captioning_through_rl_tpu.metrics.cider import cider
    from image_captioning_through_rl_tpu.metrics.meteor import meteor_sentence
    from image_captioning_through_rl_tpu.metrics.native import (
        cider_native,
        corpus_bleu_native,
        meteor_scores_native,
        rouge_scores_native,
    )
    from image_captioning_through_rl_tpu.metrics.rouge import rouge_l_sentence

    rng = np.random.default_rng(5)
    words = ("a the of on in at dog cat man woman park red blue runs sits "
             "holding small large two").split()

    def sent():
        n = int(rng.integers(4, 14))
        return " ".join(words[i] for i in rng.integers(0, len(words), n))

    refs = {i: [sent(), sent()] for i in range(200)}
    hypos = {i: [sent()] for i in range(200)}
    try:
        nb = corpus_bleu_native(refs, hypos)
        nc = cider_native(refs, hypos)
        nr = rouge_scores_native(refs, hypos)
        nm = meteor_scores_native(refs, hypos)
        if any(x is None for x in (nb, nc, nr, nm)):
            print("[bench] native metric kernels unavailable (toolchain?)",
                  file=sys.stderr)
            return False
        pb = corpus_bleu(refs, hypos)
        pc = cider(refs, hypos)
        pr = [rouge_l_sentence(hypos[i][0], refs[i]) for i in hypos]
        pm = [meteor_sentence(hypos[i][0], refs[i]) for i in hypos]
        ok = (np.allclose(nb, pb, rtol=1e-12, atol=0)
              and np.isclose(nc, pc, rtol=1e-12, atol=0)
              and np.allclose(nr, pr, rtol=1e-12, atol=0)
              and np.allclose(nm, pm, rtol=1e-12, atol=0))
        if not ok:
            print(f"[bench] fastmetrics drift: bleu {nb} vs {pb}, cider "
                  f"{nc} vs {pc}, rouge/meteor max |d| = "
                  f"{np.abs(np.subtract(nr, pr)).max():.2e}/"
                  f"{np.abs(np.subtract(nm, pm)).max():.2e}", file=sys.stderr)
        return bool(ok)
    except Exception as e:
        print(f"[bench] fastmetrics check failed ({type(e).__name__}: {e})",
              file=sys.stderr)
        return False


def main() -> None:
    paths, fused_ok, grads_ok = bench_jax()
    torch_cps = bench_torch_cpu()
    paths.update(bench_train_paths())
    fastmetrics_ok = bench_fastmetrics()
    jax_cps = max(paths.get("greedy_fused", 0.0), paths["greedy_xla"])
    # Baseline protocol: JAX runs JAX_BATCH=32768/dispatch (one chip's
    # saturating serving batch); torch-CPU runs TORCH_BATCH=128. The
    # asymmetry favors the baseline: eager torch-CPU throughput was
    # measured to PEAK at 128 and drop at larger batches (256 -> -10%,
    # 512 -> -34%, 1024 -> -30%; benchmarks/BENCHMARKS.md "baseline
    # protocol"), so 128 is the reference's best batch. Rates are
    # per-caption, batch-amortized,
    # synced by host readback (tunnel RTT <1% at these window sizes).
    print(json.dumps({
        "metric": "greedy_decode_captions_per_sec_per_chip",
        "value": round(jax_cps, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(jax_cps / torch_cps, 2),
        "fused_ok": fused_ok,
        "fused_grads_ok": grads_ok,
        "fastmetrics_ok": fastmetrics_ok,
        "a2c_steps_per_sec_512ep": round(paths["a2c_step"], 2),
        # per-path attribution (VERDICT r04 item 3): decode paths in
        # captions/s (greedy @32768, beam5 @1024, sampling @8192),
        # *_step paths in steps/s (chunked k=16 @512 episodes)
        "paths": {k: round(v, 2) for k, v in paths.items()},
    }))


if __name__ == "__main__":
    main()

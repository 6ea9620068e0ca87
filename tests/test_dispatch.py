"""VerifiedDispatch: canary verdicts latch correctly (utils/dispatch.py)."""

import numpy as np
import pytest

from image_captioning_through_rl_tpu.utils.dispatch import VerifiedDispatch


def test_agreement_latches_fast_path():
    calls = {"fast": 0, "ref": 0}

    def fast(x):
        calls["fast"] += 1
        return np.asarray([x, x])

    def ref(x):
        calls["ref"] += 1
        return np.asarray([x, x])

    d = VerifiedDispatch(fast, ref, equal=np.array_equal)
    np.testing.assert_array_equal(d(3), [3, 3])
    assert d.verdict is True
    d(4), d(5)
    assert calls == {"fast": 3, "ref": 1}  # ref only ran for the canary


def test_divergence_latches_ref_path():
    def fast(x):
        return np.asarray([x + 1])

    def ref(x):
        return np.asarray([x])

    seen = []
    d = VerifiedDispatch(fast, ref, equal=np.array_equal,
                         on_verdict=lambda ok, exc: seen.append((ok, exc)))
    np.testing.assert_array_equal(d(3), [3])  # canary mismatch -> ref result
    assert d.verdict is False and seen == [(False, None)]
    np.testing.assert_array_equal(d(7), [7])  # fast never called again


def test_fast_exception_latches_ref_and_reports():
    def fast(x):
        raise RuntimeError("no Mosaic backend")

    seen = []
    d = VerifiedDispatch(fast, lambda x: np.asarray([x]), equal=np.array_equal,
                         on_verdict=lambda ok, exc: seen.append((ok, type(exc))))
    np.testing.assert_array_equal(d(2), [2])
    assert d.verdict is False
    assert seen == [(False, RuntimeError)]
    np.testing.assert_array_equal(d(9), [9])


def test_coinflip_divergence_retries_and_latches_fast():
    """A mismatch on the live key re-canaries on retry_args (fresh keys);
    one exact agreement locks the KERNEL in — the round-4 failure mode
    (a server warming up on an unlucky key serving filtered sampling
    1.35-4.9x slower forever) cannot latch any more."""
    def fast(x, key):
        # key 0 is the unlucky tie: one draw flips vs the reference
        return np.asarray([x + (1 if key == 0 else 0), x])

    def ref(x, key):
        return np.asarray([x, x])

    seen = []
    d = VerifiedDispatch(
        fast, ref, equal=np.array_equal,
        on_verdict=lambda ok, exc: seen.append((ok, exc)),
        retry_args=lambda attempt, x, key: (x, key + attempt))
    out = d(3, 0)
    assert d.verdict is True and d.attempts == 2
    assert seen == [(True, None)]
    # the latched-kernel draw serves the live call too (same-seed
    # determinism: later identical calls ride the kernel)
    np.testing.assert_array_equal(out, fast(3, 0))


def test_systematic_divergence_fails_every_retry_and_latches_ref():
    def fast(x, key):
        return np.asarray([x + 1])  # broken under every key

    def ref(x, key):
        return np.asarray([x])

    d = VerifiedDispatch(fast, ref, equal=np.array_equal,
                         retry_args=lambda attempt, x, key: (x, key + attempt))
    np.testing.assert_array_equal(d(3, 0), [3])
    assert d.verdict is False and d.attempts == 3  # live + 2 retries
    np.testing.assert_array_equal(d(7, 0), [7])  # ref serves afterwards


def test_retry_exception_latches_ref():
    """A kernel that mismatches then CRASHES on the retry key latches the
    reference path and still returns the trusted output."""
    def fast(x, key):
        if key != 0:
            raise RuntimeError("lowering failure on retry")
        return np.asarray([x + 1])

    seen = []
    d = VerifiedDispatch(
        fast, lambda x, key: np.asarray([x]), equal=np.array_equal,
        on_verdict=lambda ok, exc: seen.append((ok, type(exc) if exc else None)),
        retry_args=lambda attempt, x, key: (x, attempt))
    np.testing.assert_array_equal(d(4, 0), [4])
    assert d.verdict is False and seen == [(False, RuntimeError)]


def test_no_retry_args_keeps_single_canary():
    """Without retry_args the round-4 contract is unchanged: one canary,
    mismatch latches ref immediately."""
    d = VerifiedDispatch(lambda x: np.asarray([x + 1]),
                         lambda x: np.asarray([x]), equal=np.array_equal)
    np.testing.assert_array_equal(d(3), [3])
    assert d.verdict is False and d.attempts == 1


def test_sampling_dispatch_wires_fresh_key_retries():
    """The Captioner's sampling dispatch (the server warmup path — see
    server.py warmup) registers retry_args, so a per-key canary flip
    re-rolls instead of pinning XLA for the process lifetime."""
    import jax

    from image_captioning_through_rl_tpu.api import Captioner
    from image_captioning_through_rl_tpu.config import NetConfig

    cfg = NetConfig(vocab_size=40, input_dim=24, wordvec_dim=16,
                    hidden_dim=16)
    from image_captioning_through_rl_tpu.models import policy

    cap = Captioner(policy.init(jax.random.PRNGKey(0), cfg), cfg,
                    idx_to_word=[f"w{i}" for i in range(40)])
    feats = np.random.default_rng(0).standard_normal((4, 24)).astype(np.float32)
    cap.sample_tokens(feats, top_k=8, temperature=0.9)
    (key, disp), = cap._fused_verdict.items()
    assert key[0] == "sample"
    assert disp._retry_args is not None and disp._retries == 2
    # greedy dispatch stays single-canary (tie flips there are a weight
    # property, not a key property — rekeying cannot help)
    cap.caption_tokens(feats)
    gdisp = cap._fused_verdict[("greedy",)]
    assert gdisp._retries == 0


def test_verdict_none_until_first_call():
    d = VerifiedDispatch(lambda: 1, lambda: 1, equal=lambda a, b: a == b)
    assert d.verdict is None


def test_verified_dispatch_concurrent_first_calls():
    """Concurrent first calls (server warmup racing live traffic) must
    run exactly ONE canary: a single on_verdict fire, one latched
    verdict, and the slow double-execution happens once."""
    import threading
    import time

    from image_captioning_through_rl_tpu.utils.dispatch import VerifiedDispatch

    calls = {"fast": 0, "ref": 0, "verdicts": []}
    lock = threading.Lock()

    def fast(x):
        with lock:
            calls["fast"] += 1
        time.sleep(0.05)  # widen the race window
        return x

    def ref(x):
        with lock:
            calls["ref"] += 1
        return x

    disp = VerifiedDispatch(fast, ref, equal=lambda a, b: a == b,
                            on_verdict=lambda ok, exc: calls["verdicts"].append(ok))
    barrier = threading.Barrier(4)
    results = []

    def worker():
        barrier.wait()
        results.append(disp(7))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [7, 7, 7, 7]
    assert calls["verdicts"] == [True]   # one canary, one fire
    assert calls["ref"] == 1             # ref ran only for the canary
    assert disp.verdict is True

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

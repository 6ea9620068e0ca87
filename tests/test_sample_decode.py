"""Stochastic sampling decode (decode/sample.py): filter semantics vs
numpy oracles, greedy limits, determinism, top-k containment, first-step
distribution, n-best tiling, and the Captioner surface.

The reference has no sampling decoder (its only stochastic draw is the
training rollout, trainers.py:445-450) — these tests pin the added
capability's semantics instead of reference parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.api import Captioner
from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.decode import (
    greedy_decode,
    sample_decode,
    sample_decode_full_prefix,
    sample_decode_n,
)
from image_captioning_through_rl_tpu.decode.sample import filter_logits
from image_captioning_through_rl_tpu.models import policy

VOCAB = 23
CFG = NetConfig(
    vocab_size=VOCAB, input_dim=12, wordvec_dim=14, hidden_dim=16,
    max_seq_len=9, precision="highest",
)


def _params_and_feats(rng_np, n=6):
    params = policy.init(jax.random.PRNGKey(3), CFG)
    feats = jnp.asarray(rng_np.standard_normal((n, CFG.input_dim)), jnp.float32)
    start = jnp.ones(n, jnp.int32)
    return params, feats, start


# ---- filter_logits vs numpy oracles -------------------------------------

def test_top_k_filter_matches_numpy(rng_np):
    logits = rng_np.standard_normal((7, VOCAB)).astype(np.float32)
    k = 5
    got = np.asarray(filter_logits(jnp.asarray(logits), top_k=k))
    for row_got, row in zip(got, logits):
        keep = set(np.argsort(row)[-k:])
        for v in range(VOCAB):
            if v in keep:
                assert row_got[v] == row[v]
            else:
                assert row_got[v] == -np.inf


def test_top_p_filter_matches_numpy(rng_np):
    logits = rng_np.standard_normal((7, VOCAB)).astype(np.float32)
    top_p = 0.6
    got = np.asarray(filter_logits(jnp.asarray(logits), top_p=jnp.float32(top_p)))
    for row_got, row in zip(got, logits):
        order = np.argsort(-row)
        p = np.exp(row - row.max())
        p /= p.sum()
        cum = 0.0
        keep = set()
        for v in order:  # smallest prefix reaching top_p, crosser included
            keep.add(v)
            cum += p[v]
            if cum >= top_p:
                break
        for v in range(VOCAB):
            if v in keep:
                assert row_got[v] == row[v]
            else:
                assert row_got[v] == -np.inf


def test_top_p_always_keeps_argmax(rng_np):
    logits = rng_np.standard_normal((4, VOCAB)).astype(np.float32)
    got = np.asarray(filter_logits(jnp.asarray(logits), top_p=jnp.float32(1e-9)))
    finite = np.isfinite(got)
    assert (finite.sum(axis=-1) == 1).all()
    np.testing.assert_array_equal(finite.argmax(axis=-1), logits.argmax(axis=-1))


# ---- greedy limits -------------------------------------------------------

def test_top_k_1_equals_greedy(rng_np):
    params, feats, start = _params_and_feats(rng_np)
    want = greedy_decode(params, CFG, feats, start)
    got = sample_decode(params, CFG, feats, start, jax.random.PRNGKey(0), top_k=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tiny_top_p_equals_greedy(rng_np):
    params, feats, start = _params_and_feats(rng_np)
    want = greedy_decode(params, CFG, feats, start)
    got = sample_decode(params, CFG, feats, start, jax.random.PRNGKey(1),
                        top_p=jnp.float32(1e-9))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ---- determinism + spread ------------------------------------------------

def test_same_key_bit_identical_different_keys_differ(rng_np):
    params, feats, start = _params_and_feats(rng_np)
    a = sample_decode(params, CFG, feats, start, jax.random.PRNGKey(7),
                      temperature=jnp.float32(2.0))
    b = sample_decode(params, CFG, feats, start, jax.random.PRNGKey(7),
                      temperature=jnp.float32(2.0))
    c = sample_decode(params, CFG, feats, start, jax.random.PRNGKey(8),
                      temperature=jnp.float32(2.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_sampled_tokens_stay_inside_top_k(rng_np):
    """Teacher-force the sampled path back through the policy and check
    every drawn token was inside that step's top-k set."""
    k = 3
    params, feats, start = _params_and_feats(rng_np)
    toks = np.asarray(sample_decode(
        params, CFG, feats, start, jax.random.PRNGKey(5), top_k=k))
    logits = np.asarray(policy.forward(params, CFG, feats, jnp.asarray(toks)))
    for t in range(CFG.max_seq_len - 1):
        step_logits = logits[:, t, :]  # logits that produced toks[:, t+1]
        kth = np.sort(step_logits, axis=-1)[:, -k]
        drawn = np.take_along_axis(step_logits, toks[:, t + 1][:, None], -1)[:, 0]
        assert (drawn >= kth).all()


def test_first_step_distribution_matches_softmax(rng_np):
    """Empirical first-token frequencies track softmax(logits/T): draw
    the first step over a tiled batch and compare to the exact
    distribution (one image, 4000 draws, L1 tolerance)."""
    params, feats, start = _params_and_feats(rng_np, n=1)
    temp = 1.5
    n_draws = 4000
    toks = np.asarray(sample_decode_n(
        params, CFG, feats, start, jax.random.PRNGKey(11), n_draws,
        temperature=jnp.float32(temp)))[0, :, 1]
    state0 = policy.init_decode_state(params, CFG, feats)
    logits, _ = policy.step(params, CFG, start, state0)
    p = jax.nn.softmax(jnp.asarray(logits[0], jnp.float32) / temp)
    emp = np.bincount(toks, minlength=VOCAB) / n_draws
    assert np.abs(emp - np.asarray(p)).sum() < 0.08


# ---- full-prefix / bidirectional -----------------------------------------

def test_full_prefix_matches_scan_unidirectional(rng_np):
    """Same key schedule: the O(T^2) variant is bit-identical to the
    scan for a unidirectional policy."""
    params, feats, start = _params_and_feats(rng_np)
    a = sample_decode(params, CFG, feats, start, jax.random.PRNGKey(2),
                      temperature=jnp.float32(1.3), top_k=4)
    b = sample_decode_full_prefix(params, CFG, feats, start, jax.random.PRNGKey(2),
                                  temperature=jnp.float32(1.3), top_k=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bidirectional_sampling_runs(rng_np):
    cfg = NetConfig(
        vocab_size=VOCAB, input_dim=12, wordvec_dim=14, hidden_dim=16,
        max_seq_len=7, bidirectional=True, precision="highest",
    )
    params = policy.init(jax.random.PRNGKey(4), cfg)
    feats = jnp.asarray(rng_np.standard_normal((3, cfg.input_dim)), jnp.float32)
    toks = sample_decode_n(params, cfg, feats, jnp.ones(3, jnp.int32),
                           jax.random.PRNGKey(0), 2)
    assert toks.shape == (3, 2, cfg.max_seq_len)
    assert (np.asarray(toks) >= 0).all() and (np.asarray(toks) < VOCAB).all()


# ---- n-best + API surface -------------------------------------------------

def test_n_best_rows_group_by_image(rng_np):
    params, feats, start = _params_and_feats(rng_np, n=4)
    toks = sample_decode_n(params, CFG, feats, start, jax.random.PRNGKey(9), 3,
                           temperature=jnp.float32(2.0))
    assert toks.shape == (4, 3, CFG.max_seq_len)
    flat = sample_decode(params, CFG, jnp.repeat(feats, 3, axis=0),
                         jnp.repeat(start, 3, axis=0), jax.random.PRNGKey(9),
                         temperature=jnp.float32(2.0))
    np.testing.assert_array_equal(
        np.asarray(toks), np.asarray(flat).reshape(4, 3, -1))


def test_captioner_sampling_surface(rng_np):
    params, feats, _ = _params_and_feats(rng_np, n=3)
    idx_to_word = {i: f"w{i}" for i in range(VOCAB)}
    idx_to_word[0], idx_to_word[1], idx_to_word[2] = "<NULL>", "<START>", "<END>"
    cap = Captioner(params, CFG, idx_to_word)
    # deterministic under a seed
    a = cap.sample_tokens(feats, temperature=1.7, top_k=5, seed=42)
    b = cap.sample_tokens(feats, temperature=1.7, top_k=5, seed=42)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, CFG.max_seq_len)
    # n-best shape + string surface
    multi = cap.sample_captions(feats, num_samples=2, temperature=1.7, seed=1)
    assert len(multi) == 3 and all(len(r) == 2 for r in multi)
    assert all(isinstance(s, str) for r in multi for s in r)
    single = cap.sample_captions(feats, temperature=1.7, seed=1)
    assert len(single) == 3 and isinstance(single[0], str)
    # temperature=0 routes to exact greedy, tiled over samples
    g = cap.caption_tokens(feats, use_fused_kernel=False)
    z = cap.sample_tokens(feats, temperature=0.0, num_samples=2)
    np.testing.assert_array_equal(z[:, 0], g)
    np.testing.assert_array_equal(z[:, 1], g)
    # validation
    with pytest.raises(ValueError):
        cap.sample_tokens(feats, temperature=-1.0)
    with pytest.raises(ValueError):
        cap.sample_tokens(feats, top_p=0.0)
    with pytest.raises(ValueError):
        cap.sample_tokens(feats, num_samples=0)

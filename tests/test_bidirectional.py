"""Bidirectional mode: beam/rollout full-prefix paths + e2e pipeline."""

import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig
from image_captioning_through_rl_tpu.decode import beam_search, beam_search_full_prefix
from image_captioning_through_rl_tpu.models import a2c, policy, reward, value
from image_captioning_through_rl_tpu.train import optim, steps

from torch_oracles import rand_captions, rand_features

VOCAB = 25
CFG_UNI = NetConfig(vocab_size=VOCAB, input_dim=12, wordvec_dim=14, hidden_dim=16, max_seq_len=7)
CFG_BI = NetConfig(
    vocab_size=VOCAB, input_dim=12, wordvec_dim=14, hidden_dim=16,
    max_seq_len=7, bidirectional=True,
)


def test_beam_full_prefix_equals_carried_state_beam(rng_np):
    """For a unidirectional model the two beam implementations must agree."""
    pp = policy.init(jax.random.PRNGKey(0), CFG_UNI)
    vp = value.init(jax.random.PRNGKey(1), CFG_UNI)
    feats = jnp.asarray(rand_features(rng_np, 4, CFG_UNI.input_dim))
    start = jnp.ones(4, jnp.int32)
    dcfg = DecodeConfig(beam_size=3, max_seq_len=CFG_UNI.max_seq_len)
    t1, s1 = beam_search(pp, vp, CFG_UNI, dcfg, feats, start)
    t2, s2 = beam_search_full_prefix(pp, vp, CFG_UNI, dcfg, feats, start)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_beam_full_prefix_bidirectional_runs(rng_np):
    pp = policy.init(jax.random.PRNGKey(2), CFG_BI)
    vp = value.init(jax.random.PRNGKey(3), CFG_BI)
    feats = jnp.asarray(rand_features(rng_np, 3, CFG_BI.input_dim))
    dcfg = DecodeConfig(beam_size=3, max_seq_len=CFG_BI.max_seq_len)
    toks, scores = jax.jit(
        lambda f, s: beam_search_full_prefix(pp, vp, CFG_BI, dcfg, f, s)
    )(feats, jnp.ones(3, jnp.int32))
    assert toks.shape == (3, 3, CFG_BI.max_seq_len)
    assert np.isfinite(np.asarray(scores)).all()


def test_a2c_step_bidirectional(rng_np):
    feats = jnp.asarray(rand_features(rng_np, 6, CFG_BI.input_dim))
    caps = jnp.asarray(rand_captions(rng_np, 6, CFG_BI.max_seq_len, VOCAB).astype(np.int32))
    params = a2c.init(jax.random.PRNGKey(4), CFG_BI)
    rparams = reward.init(jax.random.PRNGKey(5), CFG_BI)
    tx = optim.adam(1e-4)
    step = steps.make_a2c_step(CFG_BI, tx)
    new_params, _, stats = step(
        params, tx.init(params), rparams, feats, caps, jnp.int32(1), jax.random.PRNGKey(6)
    )
    assert np.isfinite(float(stats.loss))
    # parameters actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params))
    )
    assert moved


def test_a2c_full_rollout_equals_scan_rollout_unidirectional(rng_np):
    """Same rng => the full-prefix rollout must reproduce the carried-state
    scan rollout exactly (unidirectional)."""
    feats = jnp.asarray(rand_features(rng_np, 5, CFG_UNI.input_dim))
    caps = jnp.asarray(rand_captions(rng_np, 5, CFG_UNI.max_seq_len, VOCAB).astype(np.int32))
    params = a2c.init(jax.random.PRNGKey(7), CFG_UNI)
    rparams = reward.init(jax.random.PRNGKey(8), CFG_UNI)
    caplen = jnp.max(steps.batch_caption_lens(caps))
    args = (params, CFG_UNI, rparams, feats, caps, jnp.int32(1), caplen, jax.random.PRNGKey(9))
    loss_scan, stats_scan = steps.a2c_rollout_loss(*args)
    loss_full, stats_full = steps.a2c_rollout_loss_full(*args)
    np.testing.assert_allclose(float(loss_scan), float(loss_full), rtol=1e-4)
    np.testing.assert_allclose(
        float(stats_scan.mean_reward), float(stats_full.mean_reward), rtol=1e-4, atol=1e-5
    )


def test_value_step_bidirectional(rng_np):
    feats = jnp.asarray(rand_features(rng_np, 6, CFG_BI.input_dim))
    caps = jnp.asarray(rand_captions(rng_np, 6, CFG_BI.max_seq_len, VOCAB).astype(np.int32))
    pparams = policy.init(jax.random.PRNGKey(10), CFG_BI)
    rparams = reward.init(jax.random.PRNGKey(11), CFG_BI)
    vparams = value.init(jax.random.PRNGKey(12), CFG_BI)
    tx = optim.adam(1e-3)
    step = steps.make_value_step(CFG_BI, tx)
    opt_state = tx.init(vparams)
    for plen in (1, 4, CFG_BI.max_seq_len):
        vparams, opt_state, loss = step(
            vparams, opt_state, pparams, rparams, feats, caps, plen
        )
        assert np.isfinite(float(loss))

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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_value_compat_bidirectional_matches_stateful_torch_oracle(rng_np):
    """Q1 batch-as-time statefulness in BIDIRECTIONAL mode: both
    directions' carries thread across columns and across calls, matching
    a persistent-hidden nn.LSTM(bidirectional=True) oracle."""
    import torch

    from image_captioning_through_rl_tpu.models import value_from_torch
    from torch_oracles import TorchValueOracle, value_state_dict

    cfg = NetConfig(
        vocab_size=VOCAB, input_dim=12, wordvec_dim=14, hidden_dim=16,
        bidirectional=True, precision="highest",
    )
    oracle = TorchValueOracle(VOCAB, 12, 14, 16, bidirectional=True)
    oracle.reset_hidden()
    feats = rand_features(rng_np, 5, 12)
    caps1 = rand_captions(rng_np, 5, 6, VOCAB)
    caps2 = rand_captions(rng_np, 5, 6, VOCAB)
    with torch.no_grad():
        ref1 = oracle.forward_compat(torch.from_numpy(feats), torch.from_numpy(caps1)).numpy()
        ref2 = oracle.forward_compat(torch.from_numpy(feats), torch.from_numpy(caps2)).numpy()

    params = value_from_torch(value_state_dict(oracle), bidirectional=True)
    carry = value.compat_zero_state(cfg)
    got1, carry = value.forward_compat(params, cfg, jnp.asarray(feats), jnp.asarray(caps1), carry)
    got2, carry = value.forward_compat(params, cfg, jnp.asarray(feats), jnp.asarray(caps2), carry)
    np.testing.assert_allclose(np.asarray(got1), ref1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), ref2, rtol=1e-4, atol=1e-5)
    # outgoing carries match the oracle's persistent hidden_cell
    (hf, cf), (hb, cb) = carry
    np.testing.assert_allclose(np.asarray(hf), oracle.hidden_cell[0][0, 0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hb), oracle.hidden_cell[0][1, 0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf), oracle.hidden_cell[1][0, 0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cb), oracle.hidden_cell[1][1, 0].numpy(), rtol=1e-4, atol=1e-5)


def test_reward_compat_bidirectional_matches_stateful_torch_oracle(rng_np):
    import torch

    from image_captioning_through_rl_tpu.models import reward_from_torch
    from torch_oracles import TorchRewardOracle, reward_state_dict

    cfg = NetConfig(
        vocab_size=VOCAB, input_dim=12, wordvec_dim=14, hidden_dim=16,
        bidirectional=True, precision="highest",
    )
    oracle = TorchRewardOracle(VOCAB, 12, 14, 16, bidirectional=True)
    oracle.reset_hidden()
    feats = rand_features(rng_np, 4, 12)
    caps1 = rand_captions(rng_np, 4, 5, VOCAB)
    caps2 = rand_captions(rng_np, 4, 5, VOCAB)
    with torch.no_grad():
        rve1, rse1 = oracle.forward_compat(torch.from_numpy(feats), torch.from_numpy(caps1))
        rve2, rse2 = oracle.forward_compat(torch.from_numpy(feats), torch.from_numpy(caps2))

    params = reward_from_torch(reward_state_dict(oracle), bidirectional=True)
    carry = reward.compat_zero_state(cfg)
    (gve1, gse1), carry = reward.forward_compat(params, cfg, jnp.asarray(feats), jnp.asarray(caps1), carry)
    (gve2, gse2), carry = reward.forward_compat(params, cfg, jnp.asarray(feats), jnp.asarray(caps2), carry)
    np.testing.assert_allclose(np.asarray(gse1), rse1.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gse2), rse2.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gve1), rve1.numpy(), rtol=1e-4, atol=1e-5)
    hf, hb = carry
    np.testing.assert_allclose(np.asarray(hf), oracle.hidden_cell[0, 0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hb), oracle.hidden_cell[1, 0].numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_bidirectional_faithful_beam_matches_stateful_torch_oracle(rng_np):
    """--bidirectional --faithful_beam: the Q1-stateful beam with
    per-direction carried hiddens must reproduce the torch oracle's
    bidirectional eval loop token-for-token."""
    import torch

    from image_captioning_through_rl_tpu.decode import beam_search_compat
    from image_captioning_through_rl_tpu.models import policy_from_torch, value_from_torch
    from test_decode import _oracle_beam_stateful
    from torch_oracles import (
        TorchPolicyOracle,
        TorchValueOracle,
        policy_state_dict,
        value_state_dict,
    )

    cfg = NetConfig(
        vocab_size=VOCAB, input_dim=12, wordvec_dim=14, hidden_dim=16,
        max_seq_len=7, bidirectional=True, precision="highest",
    )
    pol = TorchPolicyOracle(VOCAB, 12, 14, 16, bidirectional=True)
    with torch.no_grad():  # keep Q2b's log(raw top-k logits) finite
        pol.linear2vocab.bias += 10.0
    val = TorchValueOracle(VOCAB, 12, 14, 16, bidirectional=True)
    val.reset_hidden()
    feats = rand_features(rng_np, 3, 12)
    start = np.ones(3, np.int32)
    dcfg = DecodeConfig(beam_size=2, max_seq_len=cfg.max_seq_len, per_sample_beams=False)

    ref = _oracle_beam_stateful(pol, val, feats, start, dcfg)

    pp = policy_from_torch(policy_state_dict(pol), bidirectional=True)
    vp = value_from_torch(value_state_dict(val), bidirectional=True)
    toks, scores, carry = beam_search_compat(
        pp, vp, cfg, dcfg, jnp.asarray(feats), jnp.asarray(start)
    )
    for b_i in range(dcfg.beam_size):
        np.testing.assert_array_equal(np.asarray(toks[:, b_i]), ref[b_i][0].numpy())
        np.testing.assert_allclose(
            np.asarray(scores[:, b_i]), ref[b_i][1][:, 0].numpy(), rtol=1e-4, atol=1e-4)
    # outgoing per-direction carries match the oracle's hidden_cell
    (hf, cf), (hb, cb) = carry
    np.testing.assert_allclose(np.asarray(hf), val.hidden_cell[0][0, 0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hb), val.hidden_cell[0][1, 0].numpy(), rtol=1e-4, atol=1e-5)


def test_bidirectional_carried_decode_family_equals_full_prefix(rng_np):
    """The carried-state decode family is exact for BIDIRECTIONAL
    policies too (round 5): decode reads only the prefix's last
    position, and the backward direction's hidden there is its reverse
    scan's FIRST step — one cell applied to the current token from the
    fixed backward initial state (models/policy.py). Token-for-token
    against the reference-literal full-prefix oracles for greedy,
    sampling, and both beam modes."""
    from image_captioning_through_rl_tpu.decode import (
        greedy_decode,
        greedy_decode_full_prefix,
        sample_decode,
        sample_decode_full_prefix,
    )

    pp = policy.init(jax.random.PRNGKey(2), CFG_BI)
    vp = value.init(jax.random.PRNGKey(3), CFG_BI)
    n = 6
    feats = jnp.asarray(rand_features(rng_np, n, CFG_BI.input_dim))
    start = jnp.ones(n, jnp.int32)

    np.testing.assert_array_equal(
        np.asarray(greedy_decode(pp, CFG_BI, feats, start)),
        np.asarray(greedy_decode_full_prefix(pp, CFG_BI, feats, start)))

    key = jax.random.PRNGKey(11)
    for kw in (dict(temperature=0.9, top_k=5),
               dict(temperature=1.2, top_p=jnp.float32(0.8))):
        np.testing.assert_array_equal(
            np.asarray(sample_decode(pp, CFG_BI, feats, start, key, **kw)),
            np.asarray(sample_decode_full_prefix(
                pp, CFG_BI, feats, start, key, **kw)))

    for per_sample in (True, False):
        dcfg = DecodeConfig(beam_size=3, max_seq_len=CFG_BI.max_seq_len,
                            per_sample_beams=per_sample)
        t1, s1 = beam_search(pp, vp, CFG_BI, dcfg, feats, start)
        t2, s2 = beam_search_full_prefix(pp, vp, CFG_BI, dcfg, feats, start)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-4, atol=1e-4)


def test_bidirectional_incremental_state_matches_batched_forward(rng_np):
    """policy.step / value.rnn_step carry exact bidirectional state:
    at every prefix length the stepped logits/value equal the batched
    full-prefix forward's last position."""
    pp = policy.init(jax.random.PRNGKey(4), CFG_BI)
    vp = value.init(jax.random.PRNGKey(5), CFG_BI)
    n = 5
    feats = jnp.asarray(rand_features(rng_np, n, CFG_BI.input_dim))
    caps = jnp.asarray(
        rand_captions(rng_np, n, CFG_BI.max_seq_len, VOCAB).astype(np.int32))

    pstate = policy.init_decode_state(pp, CFG_BI, feats)
    vstate = value.zero_rnn_state(CFG_BI, n)
    for t in range(CFG_BI.max_seq_len - 1):
        logits, pstate = policy.step(pp, CFG_BI, caps[:, t], pstate)
        full = policy.forward(pp, CFG_BI, feats, caps[:, : t + 1])[:, -1, :]
        np.testing.assert_allclose(np.asarray(logits), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)
        vstate = value.rnn_step(vp, CFG_BI, caps[:, t], vstate)
        v_inc = value.value_from_state(vp, CFG_BI, feats, vstate)
        v_full = value.forward(vp, CFG_BI, feats, caps[:, : t + 1])
        np.testing.assert_allclose(np.asarray(v_inc), np.asarray(v_full),
                                   rtol=1e-5, atol=1e-5)

"""Decode parity: greedy vs the reference's torch loop; beam search vs
literal Python oracles of the reference algorithm (trainers.py:73-105)."""

import pytest
import numpy as np
import torch

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig
from image_captioning_through_rl_tpu.decode import (
    beam_search,
    beam_search_compat,
    greedy_decode,
    greedy_decode_full_prefix,
)
from image_captioning_through_rl_tpu.models import (
    policy,
    policy_from_torch,
    value,
    value_from_torch,
)

from torch_oracles import (
    TorchPolicyOracle,
    TorchValueOracle,
    policy_state_dict,
    rand_features,
    value_state_dict,
)

VOCAB = 23
CFG = NetConfig(
    vocab_size=VOCAB, input_dim=12, wordvec_dim=14, hidden_dim=16,
    max_seq_len=9, precision="highest",
)


def test_greedy_matches_torch_reference_loop(rng_np):
    """Token-for-token parity with the reference's O(T^2) greedy loop."""
    oracle = TorchPolicyOracle(VOCAB, CFG.input_dim, CFG.wordvec_dim, CFG.hidden_dim)
    feats = rand_features(rng_np, 6, CFG.input_dim)
    start = np.ones((6, 1), dtype=np.int64)

    # reference loop (trainers.py:65-70)
    with torch.no_grad():
        f = torch.from_numpy(feats)[None]
        caps = torch.from_numpy(start)
        for _ in range(CFG.max_seq_len - 1):
            out = oracle(f, caps)
            caps = torch.cat((caps, out[:, -1:, :].argmax(axis=2)), axis=1)

    params = policy_from_torch(policy_state_dict(oracle))
    got = greedy_decode(params, CFG, jnp.asarray(feats), jnp.ones(6, jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), caps.numpy())


def test_greedy_full_prefix_equals_scan(rng_np):
    params = policy.init(jax.random.PRNGKey(3), CFG)
    feats = jnp.asarray(rand_features(rng_np, 5, CFG.input_dim))
    start = jnp.ones(5, jnp.int32)
    a = greedy_decode(params, CFG, feats, start)
    b = greedy_decode_full_prefix(params, CFG, feats, start)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _oracle_beam(pp, vp, cfg, feats, start_np, dcfg):
    """Literal Python re-statement of the reference's beam loop."""
    n = feats.shape[0]
    B = dcfg.beam_size
    candidates = [(start_np[:, None].astype(np.int64), np.zeros(n, np.float32))]
    for _ in range(dcfg.max_seq_len - 1):
        nxt = []
        for cap, sc in candidates:
            logits = np.asarray(policy.forward(pp, cfg, feats, jnp.asarray(cap))[:, -1, :])
            order = np.argsort(-logits, axis=1)[:, :B]  # top-k indices
            vals = np.take_along_axis(logits, order, axis=1)
            if dcfg.per_sample_beams:
                logz = logits - logits.max(1, keepdims=True)
                lse = np.log(np.exp(logz).sum(1, keepdims=True)) + logits.max(1, keepdims=True)
                lp_all = logits - lse
                lp = np.take_along_axis(lp_all, order, axis=1)
            else:
                lp = np.log(vals)  # Q2b: log of raw logits
            for i in range(B):
                cap2 = np.concatenate([cap, order[:, i : i + 1]], axis=1)
                val = np.asarray(value.forward(vp, cfg, feats, jnp.asarray(cap2)))[:, 0]
                delta = dcfg.value_weight * val + dcfg.logprob_weight * lp[:, i]
                nxt.append((cap2, sc - delta))
        nxt.sort(key=lambda tup: float(tup[1].mean()))  # Q2a: batch-mean rank
        candidates = nxt[:B]
    return candidates


@pytest.mark.slow
def test_beam_batchmean_matches_reference_oracle(rng_np):
    pp = policy.init(jax.random.PRNGKey(4), CFG)
    # shift the head bias so raw logits are positive (keeps the faithful
    # mode's log(raw logit) finite for a clean comparison)
    pp["head"]["b"] = pp["head"]["b"] + 10.0
    vp = value.init(jax.random.PRNGKey(5), CFG)
    feats = jnp.asarray(rand_features(rng_np, 4, CFG.input_dim))
    start = np.ones(4, np.int32)
    dcfg = DecodeConfig(beam_size=3, max_seq_len=CFG.max_seq_len, per_sample_beams=False)

    ref = _oracle_beam(pp, vp, CFG, feats, start, dcfg)
    toks, scores = beam_search(pp, vp, CFG, dcfg, feats, jnp.asarray(start))
    for b_i in range(dcfg.beam_size):
        np.testing.assert_array_equal(np.asarray(toks[:, b_i]), ref[b_i][0])
        np.testing.assert_allclose(np.asarray(scores[:, b_i]), ref[b_i][1], rtol=1e-3, atol=1e-3)


def _oracle_beam_stateful(pol, val, feats_np, start_np, dcfg):
    """Literal reference beam (trainers.py:73-105) with the *stateful*
    value net: ``val.forward_compat`` threads its persistent
    ``hidden_cell`` through every value call, exactly like the
    reference's ``ValueNetworkRNN`` (models.py:122-135) during eval."""
    B = dcfg.beam_size
    f = torch.from_numpy(feats_np)
    gen = torch.from_numpy(start_np[:, None].astype(np.int64))
    candidates = [(gen, 0)]
    with torch.no_grad():
        for _ in range(dcfg.max_seq_len - 1):
            nxt = []
            for cap, sc in candidates:
                out = pol(f[None], cap)
                probs, words = torch.topk(out[:, -1:, :], B)
                for i in range(B):
                    cap2 = torch.cat((cap, words[:, :, i]), axis=1)
                    v = val.forward_compat(f, cap2)
                    delta = dcfg.value_weight * v + dcfg.logprob_weight * torch.log(probs[:, :, i])
                    nxt.append((cap2, sc - delta))
            nxt.sort(key=lambda tup: float(tup[1].mean()))
            candidates = nxt[:B]
    return candidates


@pytest.mark.slow
def test_beam_compat_matches_stateful_torch_oracle(rng_np):
    """Token-exact parity of the Q1-stateful faithful beam against the
    torch oracle running the reference's eval loop (VERDICT r1 #3)."""
    pol = TorchPolicyOracle(VOCAB, CFG.input_dim, CFG.wordvec_dim, CFG.hidden_dim)
    with torch.no_grad():  # keep raw top-k logits positive (Q2b log)
        pol.linear2vocab.bias += 10.0
    val = TorchValueOracle(VOCAB, CFG.input_dim, CFG.wordvec_dim, CFG.hidden_dim)
    val.reset_hidden()
    feats = rand_features(rng_np, 4, CFG.input_dim)
    start = np.ones(4, np.int32)
    dcfg = DecodeConfig(beam_size=3, max_seq_len=CFG.max_seq_len, per_sample_beams=False)

    ref = _oracle_beam_stateful(pol, val, feats, start, dcfg)

    pp = policy_from_torch(policy_state_dict(pol))
    vp = value_from_torch(value_state_dict(val))
    toks, scores, carry = beam_search_compat(
        pp, vp, CFG, dcfg, jnp.asarray(feats), jnp.asarray(start)
    )
    for b_i in range(dcfg.beam_size):
        np.testing.assert_array_equal(np.asarray(toks[:, b_i]), ref[b_i][0].numpy())
        np.testing.assert_allclose(
            np.asarray(scores[:, b_i]), ref[b_i][1][:, 0].numpy(), rtol=1e-4, atol=1e-4
        )
    # the carried hidden_cell leaving the slice matches the oracle's
    np.testing.assert_allclose(
        np.asarray(carry[0]), val.hidden_cell[0][0, 0].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(carry[1]), val.hidden_cell[1][0, 0].numpy(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_beam_compat_carry_changes_result(rng_np):
    """The carried value state is load-bearing: a non-zero entering carry
    must be able to change scores (the clean beam has no such coupling)."""
    pp = policy.init(jax.random.PRNGKey(10), CFG)
    pp["head"]["b"] = pp["head"]["b"] + 10.0
    vp = value.init(jax.random.PRNGKey(11), CFG)
    feats = jnp.asarray(rand_features(rng_np, 3, CFG.input_dim))
    start = jnp.ones(3, jnp.int32)
    dcfg = DecodeConfig(beam_size=2, max_seq_len=CFG.max_seq_len, per_sample_beams=False)
    _, s0, _ = beam_search_compat(pp, vp, CFG, dcfg, feats, start)
    carry = (jnp.full((CFG.hidden_dim,), 0.7), jnp.full((CFG.hidden_dim,), -0.4))
    _, s1, _ = beam_search_compat(pp, vp, CFG, dcfg, feats, start, carry=carry)
    assert not np.allclose(np.asarray(s0), np.asarray(s1))


@pytest.mark.slow
def test_beam_per_sample_matches_per_sample_oracle(rng_np):
    """Per-sample mode: each image's beam equals running the (batch-mean)
    oracle on that image alone (mean over a singleton batch = per-sample)."""
    pp = policy.init(jax.random.PRNGKey(6), CFG)
    vp = value.init(jax.random.PRNGKey(7), CFG)
    feats = jnp.asarray(rand_features(rng_np, 3, CFG.input_dim))
    start = np.ones(3, np.int32)
    dcfg = DecodeConfig(beam_size=3, max_seq_len=CFG.max_seq_len, per_sample_beams=True)

    toks, _ = beam_search(pp, vp, CFG, dcfg, feats, jnp.asarray(start))
    for i in range(3):
        ref = _oracle_beam(pp, vp, CFG, feats[i : i + 1], start[i : i + 1], dcfg)
        np.testing.assert_array_equal(np.asarray(toks[i : i + 1, 0]), ref[0][0])


def test_beam_search_jits_and_runs_batched(rng_np):
    pp = policy.init(jax.random.PRNGKey(8), CFG)
    vp = value.init(jax.random.PRNGKey(9), CFG)
    feats = jnp.asarray(rand_features(rng_np, 8, CFG.input_dim))
    dcfg = DecodeConfig(beam_size=5, max_seq_len=CFG.max_seq_len)
    fn = jax.jit(
        lambda f, s: beam_search(pp, vp, CFG, dcfg, f, s)
    )
    toks, scores = fn(feats, jnp.ones(8, jnp.int32))
    assert toks.shape == (8, 5, CFG.max_seq_len)
    assert scores.shape == (8, 5)
    assert np.all(np.asarray(toks[:, :, 0]) == 1)


@pytest.mark.slow
def test_beam_compat_nan_scores_rank_last(rng_np):
    """Q2b takes log of raw logits, so negative top-k logits make NaN
    candidate scores. The compat beam's jnp.argsort ranks NaN LAST —
    deterministically — so finite-scored candidates win while any
    exist, and the decode stays reproducible even when every score is
    NaN (where the reference's Python sorted() is insertion-order-
    dependent and genuinely ill-defined; see decode/beam_compat.py)."""
    pp = policy.init(jax.random.PRNGKey(20), CFG)
    vp = value.init(jax.random.PRNGKey(21), CFG)
    feats = jnp.asarray(rand_features(rng_np, 3, CFG.input_dim))
    start = jnp.ones(3, jnp.int32)
    dcfg = DecodeConfig(beam_size=3, max_seq_len=5, per_sample_beams=False)

    # Mixed case: exactly two vocab slots get huge positive logits, the
    # rest strongly negative -> each step's top-3 includes one negative
    # logit (NaN score). Finite-scored extensions must fill the beam
    # first; a NaN-scored candidate only survives in the last slot.
    b = np.full(VOCAB, -50.0, np.float32)
    b[5] = 40.0
    b[7] = 38.0
    pp_mixed = {**pp, "head": {**pp["head"], "b": jnp.asarray(b)}}
    toks, scores, _ = beam_search_compat(pp_mixed, vp, CFG, dcfg, feats, start)
    s = np.asarray(scores)
    assert np.isfinite(s[:, :2]).all(), "finite candidates must outrank NaN"
    # beams 0-1 extend only through the positive-logit tokens
    assert set(np.asarray(toks)[:, :2, 1:].ravel().tolist()) <= {5, 7}

    # All-NaN case: every logit negative -> every score NaN from step 0;
    # the decode must still be deterministic and keep B valid candidates.
    pp_neg = {**pp, "head": {**pp["head"], "b": jnp.full(VOCAB, -50.0)}}
    t1, s1, _ = beam_search_compat(pp_neg, vp, CFG, dcfg, feats, start)
    t2, s2, _ = beam_search_compat(pp_neg, vp, CFG, dcfg, feats, start)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert np.isnan(np.asarray(s1)).all()
    assert np.asarray(t1).shape == (3, 3, 5)

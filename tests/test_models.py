"""Model forward parity against reference-semantics torch oracles."""

import numpy as np
import torch

import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import (
    a2c,
    policy,
    policy_from_torch,
    reward,
    reward_from_torch,
    value,
    value_from_torch,
)

from torch_oracles import (
    TorchPolicyOracle,
    TorchRewardOracle,
    TorchValueOracle,
    policy_state_dict,
    rand_captions,
    rand_features,
    reward_state_dict,
    value_state_dict,
)

VOCAB = 37
CFG = NetConfig(vocab_size=VOCAB, input_dim=16, wordvec_dim=20, hidden_dim=24, precision="highest")
CFG_BI = NetConfig(
    vocab_size=VOCAB, input_dim=16, wordvec_dim=20, hidden_dim=24,
    bidirectional=True, precision="highest",
)


def _mk_data(rng_np, n=6, t=9):
    feats = rand_features(rng_np, n, CFG.input_dim)
    caps = rand_captions(rng_np, n, t, VOCAB)
    return feats, caps


def test_policy_forward_matches_torch(rng_np):
    oracle = TorchPolicyOracle(VOCAB, CFG.input_dim, CFG.wordvec_dim, CFG.hidden_dim)
    feats, caps = _mk_data(rng_np)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(feats)[None], torch.from_numpy(caps)).numpy()
    params = policy_from_torch(policy_state_dict(oracle))
    got = policy.forward(params, CFG, jnp.asarray(feats), jnp.asarray(caps))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_policy_forward_bidirectional_matches_torch(rng_np):
    oracle = TorchPolicyOracle(
        VOCAB, CFG.input_dim, CFG.wordvec_dim, CFG.hidden_dim, bidirectional=True
    )
    feats, caps = _mk_data(rng_np)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(feats)[None], torch.from_numpy(caps)).numpy()
    params = policy_from_torch(policy_state_dict(oracle), bidirectional=True)
    got = policy.forward(params, CFG_BI, jnp.asarray(feats), jnp.asarray(caps))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_policy_incremental_step_equals_full_forward(rng_np):
    """Carried-state stepping must equal re-encoding the whole prefix."""
    import jax

    params = policy.init(jax.random.PRNGKey(0), CFG)
    feats, caps = _mk_data(rng_np)
    feats, caps = jnp.asarray(feats), jnp.asarray(caps)
    full = policy.forward(params, CFG, feats, caps)  # [N, T, V]
    state = policy.init_decode_state(params, CFG, feats)
    for t in range(caps.shape[1]):
        logits, state = policy.step(params, CFG, caps[:, t], state)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t]), rtol=2e-4, atol=5e-5
        )


def test_value_batched_matches_torch(rng_np):
    oracle = TorchValueOracle(VOCAB, CFG.input_dim, CFG.wordvec_dim, CFG.hidden_dim)
    feats, caps = _mk_data(rng_np)
    with torch.no_grad():
        ref = oracle.forward_batched(torch.from_numpy(feats), torch.from_numpy(caps)).numpy()
    params = value_from_torch(value_state_dict(oracle))
    got = value.forward(params, CFG, jnp.asarray(feats), jnp.asarray(caps))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_value_compat_matches_reference_statefulness(rng_np):
    """Q1 parity: batch-as-time + persistent hidden across calls."""
    oracle = TorchValueOracle(VOCAB, CFG.input_dim, CFG.wordvec_dim, CFG.hidden_dim)
    feats, caps = _mk_data(rng_np)
    feats2, caps2 = _mk_data(rng_np)
    with torch.no_grad():
        ref1 = oracle.forward_compat(torch.from_numpy(feats), torch.from_numpy(caps)).numpy()
        # second call WITHOUT reset — state must carry over
        ref2 = oracle.forward_compat(torch.from_numpy(feats2), torch.from_numpy(caps2)).numpy()
    params = value_from_torch(value_state_dict(oracle))
    carry = value.compat_zero_state(CFG)
    got1, carry = value.forward_compat(params, CFG, jnp.asarray(feats), jnp.asarray(caps), carry)
    got2, _ = value.forward_compat(params, CFG, jnp.asarray(feats2), jnp.asarray(caps2), carry)
    np.testing.assert_allclose(np.asarray(got1), ref1, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got2), ref2, rtol=1e-4, atol=1e-4)


def test_value_incremental_equals_batched(rng_np):
    import jax

    params = value.init(jax.random.PRNGKey(1), CFG)
    feats, caps = _mk_data(rng_np)
    feats, caps = jnp.asarray(feats), jnp.asarray(caps)
    full = value.forward(params, CFG, feats, caps)
    state = value.zero_rnn_state(CFG, caps.shape[0])
    for t in range(caps.shape[1]):
        state = value.rnn_step(params, CFG, caps[:, t], state)
    got = value.value_from_state(params, CFG, feats, state)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), rtol=2e-4, atol=5e-5)


def test_reward_batched_and_compat_match_torch(rng_np):
    oracle = TorchRewardOracle(VOCAB, CFG.input_dim, CFG.wordvec_dim, CFG.hidden_dim)
    feats, caps = _mk_data(rng_np)
    with torch.no_grad():
        ve_b, se_b = oracle.forward_batched(torch.from_numpy(feats), torch.from_numpy(caps))
        ve_c, se_c = oracle.forward_compat(torch.from_numpy(feats), torch.from_numpy(caps))
    params = reward_from_torch(reward_state_dict(oracle))
    gve, gse = reward.forward(params, CFG, jnp.asarray(feats), jnp.asarray(caps))
    np.testing.assert_allclose(np.asarray(gve), ve_b.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gse), se_b.numpy(), rtol=1e-4, atol=1e-4)
    (cve, cse), _ = reward.forward_compat(
        params, CFG, jnp.asarray(feats), jnp.asarray(caps), reward.compat_zero_state(CFG)
    )
    np.testing.assert_allclose(np.asarray(cve), ve_c.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cse), se_c.numpy(), rtol=1e-4, atol=1e-4)


def test_a2c_forward_shapes(rng_np):
    import jax

    params = a2c.init(jax.random.PRNGKey(2), CFG)
    feats, caps = _mk_data(rng_np)
    values, logits = a2c.forward(params, CFG, jnp.asarray(feats), jnp.asarray(caps))
    assert values.shape == (feats.shape[0], 1)
    assert logits.shape == (feats.shape[0], VOCAB)

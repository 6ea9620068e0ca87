"""Compat (batch-as-time, quirk Q1) training paths."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c, policy, reward, value
from image_captioning_through_rl_tpu.train import optim, steps

from torch_oracles import rand_captions, rand_features

VOCAB = 24
CFG = NetConfig(vocab_size=VOCAB, input_dim=10, wordvec_dim=12, hidden_dim=14, max_seq_len=7)


def _batch(rng_np, n=5):
    feats = jnp.asarray(rand_features(rng_np, n, CFG.input_dim))
    caps = jnp.asarray(rand_captions(rng_np, n, CFG.max_seq_len, VOCAB).astype(np.int32))
    return feats, caps


def test_compat_value_step_runs_and_learns(rng_np):
    feats, caps = _batch(rng_np)
    pparams = policy.init(jax.random.PRNGKey(0), CFG)
    rparams = reward.init(jax.random.PRNGKey(1), CFG)
    vparams = value.init(jax.random.PRNGKey(2), CFG)
    tx = optim.adam(1e-2)
    step = steps.make_value_step(CFG, tx, compat=True)
    opt = tx.init(vparams)
    losses = []
    for i in range(10):
        vparams, opt, loss = step(vparams, opt, pparams, rparams, feats, caps, 3)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0]


@pytest.mark.slow
def test_compat_a2c_step_runs(rng_np):
    feats, caps = _batch(rng_np)
    params = a2c.init(jax.random.PRNGKey(3), CFG)
    rparams = reward.init(jax.random.PRNGKey(4), CFG)
    tx = optim.adam(1e-4)
    step = steps.make_a2c_step(CFG, tx, compat=True)
    opt = tx.init(params)
    new_params, _, stats = step(
        params, opt, rparams, feats, caps, jnp.int32(1), jax.random.PRNGKey(5)
    )
    assert np.isfinite(float(stats.loss))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params))
    )
    assert moved


@pytest.mark.slow
def test_compat_rollout_value_uses_carried_state(rng_np):
    """The compat rollout's first-step value must equal forward_compat on
    the <START> column with a fresh carry — and its later steps must NOT
    equal fresh-carry evaluations (state carries across steps)."""
    feats, caps = _batch(rng_np)
    params = a2c.init(jax.random.PRNGKey(6), CFG)
    rparams = reward.init(jax.random.PRNGKey(7), CFG)
    caplen = jnp.max(steps.batch_caption_lens(caps))
    loss_c, stats_c = steps.a2c_rollout_loss_compat(
        params, CFG, rparams, feats, caps, jnp.int32(1), caplen, jax.random.PRNGKey(8)
    )
    loss_f, stats_f = steps.a2c_rollout_loss_full(
        params, CFG, rparams, feats, caps, jnp.int32(1), caplen, jax.random.PRNGKey(8)
    )
    # same sampling rng, different encoder semantics -> different losses
    assert np.isfinite(float(loss_c))
    assert abs(float(loss_c) - float(loss_f)) > 1e-8

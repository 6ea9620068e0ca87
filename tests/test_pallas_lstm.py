"""Fused LSTM-chain kernels vs the XLA scan (interpret mode)."""

import pytest
import functools

import numpy as np

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import policy
from image_captioning_through_rl_tpu.models.initializers import embedding_init, lstm_init
from image_captioning_through_rl_tpu.ops.pallas_lstm import fused_lstm_chain
from image_captioning_through_rl_tpu.ops.rnn import lstm_scan
from image_captioning_through_rl_tpu.train import steps

CFG = NetConfig(
    vocab_size=30, input_dim=10, wordvec_dim=12, hidden_dim=14,
    max_seq_len=9, precision="highest",
)


@pytest.mark.slow
def test_chain_forward_and_grads_match_lstm_scan(rng_np):
    n, t, e, h, v = 13, 7, 12, 14, 30  # ragged batch -> internal padding
    lp = lstm_init(jax.random.PRNGKey(0), e, h)
    emb = embedding_init(jax.random.PRNGKey(1), v, e)
    toks = jnp.asarray(rng_np.integers(0, v, size=(n, t)).astype(np.int32))
    h0 = jnp.asarray(rng_np.standard_normal((n, h)).astype(np.float32))
    c0 = jnp.asarray(rng_np.standard_normal((n, h)).astype(np.float32))
    wout = jnp.asarray(rng_np.standard_normal((t, n, h)).astype(np.float32))

    def ref_loss(lp, emb, h0, c0):
        hs, _ = lstm_scan(lp, jnp.swapaxes(emb[toks], 0, 1), (h0, c0), precision="highest")
        return jnp.sum(hs * wout)

    def fused_loss(lp, emb, h0, c0):
        hs = fused_lstm_chain(lp, emb, toks, h0, c0, block_n=8,
                              weight_dtype=jnp.float32, interpret=True)
        return jnp.sum(jnp.swapaxes(hs, 0, 1) * wout)

    np.testing.assert_allclose(
        float(fused_loss(lp, emb, h0, c0)), float(ref_loss(lp, emb, h0, c0)), rtol=1e-6)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(lp, emb, h0, c0)
    g_got = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(lp, emb, h0, c0)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_policy_xe_loss_and_grads_match(rng_np):
    """policy_loss_fused == policy_loss (value and all gradients) — the
    Q5-weighted XE with the chain in Pallas, head/loss in XLA."""
    params = policy.init(jax.random.PRNGKey(2), CFG)
    n = 11
    feats = jnp.asarray(rng_np.standard_normal((n, CFG.input_dim)).astype(np.float32))
    caps = rng_np.integers(4, CFG.vocab_size, size=(n, CFG.max_seq_len)).astype(np.int32)
    caps[:, 0] = 1
    caps[:, -1] = 2
    caps = jnp.asarray(caps)
    caplens = steps.batch_caption_lens(caps)

    fused = functools.partial(
        steps.policy_loss_fused, block_n=8, weight_dtype=jnp.float32, interpret=True)
    ref = float(steps.policy_loss(params, CFG, feats, caps, caplens))
    got = float(fused(params, CFG, feats, caps, caplens))
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    g_ref = jax.grad(steps.policy_loss)(params, CFG, feats, caps, caplens)
    g_got = jax.grad(fused)(params, CFG, feats, caps, caplens)
    for (path, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_ref), key=lambda x: str(x[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g_got), key=lambda x: str(x[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_gru_chain_forward_and_grads_match_gru_scan(rng_np):
    from image_captioning_through_rl_tpu.models.initializers import gru_init
    from image_captioning_through_rl_tpu.ops.pallas_gru import fused_gru_chain
    from image_captioning_through_rl_tpu.ops.rnn import gru_scan

    n, t, e, h, v = 13, 7, 12, 14, 30
    gp = gru_init(jax.random.PRNGKey(0), e, h)
    emb = embedding_init(jax.random.PRNGKey(1), v, e)
    toks = jnp.asarray(rng_np.integers(0, v, size=(n, t)).astype(np.int32))
    h0 = jnp.asarray(rng_np.standard_normal((n, h)).astype(np.float32))
    wout = jnp.asarray(rng_np.standard_normal((t, n, h)).astype(np.float32))

    def ref_loss(gp, emb, h0):
        hs, _ = gru_scan(gp, jnp.swapaxes(emb[toks], 0, 1), h0, precision="highest")
        return jnp.sum(hs * wout)

    def fused_loss(gp, emb, h0):
        hs = fused_gru_chain(gp, emb, toks, h0, block_n=8,
                             weight_dtype=jnp.float32, interpret=True)
        return jnp.sum(jnp.swapaxes(hs, 0, 1) * wout)

    np.testing.assert_allclose(
        float(fused_loss(gp, emb, h0)), float(ref_loss(gp, emb, h0)), rtol=1e-6)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(gp, emb, h0)
    g_got = jax.grad(fused_loss, argnums=(0, 1, 2))(gp, emb, h0)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_reward_vse_loss_and_grads_match(rng_np):
    from image_captioning_through_rl_tpu.models import reward

    params = reward.init(jax.random.PRNGKey(3), CFG)
    n = 9
    feats = jnp.asarray(rng_np.standard_normal((n, CFG.input_dim)).astype(np.float32))
    caps = rng_np.integers(4, CFG.vocab_size, size=(n, CFG.max_seq_len)).astype(np.int32)
    caps[:, 0] = 1
    caps[:, -1] = 2
    caps = jnp.asarray(caps)

    fused = functools.partial(
        steps.reward_loss_fused, block_n=8, weight_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        float(fused(params, CFG, feats, caps)),
        float(steps.reward_loss(params, CFG, feats, caps)), rtol=1e-6)
    g_ref = jax.grad(steps.reward_loss)(params, CFG, feats, caps)
    g_got = jax.grad(fused)(params, CFG, feats, caps)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_value_step_matches_xla_value_step(rng_np):
    """make_value_step(fused=True) with interpreted kernels equals the
    XLA value step (same rollout, same prefix, same update)."""
    import optax

    from image_captioning_through_rl_tpu.models import policy as policy_mod
    from image_captioning_through_rl_tpu.models import reward as reward_mod
    from image_captioning_through_rl_tpu.models import value as value_mod
    from image_captioning_through_rl_tpu.train import optim

    pparams = policy_mod.init(jax.random.PRNGKey(4), CFG)
    rparams = reward_mod.init(jax.random.PRNGKey(5), CFG)
    vparams = value_mod.init(jax.random.PRNGKey(6), CFG)
    n = 8
    feats = jnp.asarray(rng_np.standard_normal((n, CFG.input_dim)).astype(np.float32))
    caps = rng_np.integers(4, CFG.vocab_size, size=(n, CFG.max_seq_len)).astype(np.int32)
    caps[:, 0] = 1
    caps = jnp.asarray(caps)
    tx = optim.adam(1e-3)

    # interpret-mode fused loss through the same step structure
    from image_captioning_through_rl_tpu.decode.greedy import greedy_decode
    from image_captioning_through_rl_tpu.ops.pallas_lstm import fused_lstm_chain
    from image_captioning_through_rl_tpu.ops.reward_ops import cosine_embedding_reward

    ref_step = steps.make_value_step(CFG, tx)
    p_ref, _, loss_ref = ref_step(
        vparams, tx.init(vparams), pparams, rparams, feats, caps, jnp.int32(4))

    def fused_loss(vp, features, gen_caps, rewards, prefix_len):
        zeros = jnp.zeros((gen_caps.shape[0], CFG.hidden_dim), jnp.float32)
        hs = fused_lstm_chain(vp["lstm"], vp["embedding"], gen_caps, zeros, zeros,
                              block_n=8, weight_dtype=jnp.float32, interpret=True)
        h = jax.lax.dynamic_index_in_dim(hs, prefix_len - 1, axis=1, keepdims=False)
        values = value_mod.value_head(vp, CFG, features, h)
        return jnp.mean(jnp.square(values - rewards))

    gen = greedy_decode(pparams, CFG, feats, caps[:, 0])
    ve, se = reward_mod.forward(rparams, CFG, feats, gen)
    rewards = jax.lax.stop_gradient(cosine_embedding_reward(ve, se)[:, None])
    loss_got, grads = jax.value_and_grad(fused_loss)(
        vparams, feats, gen, rewards, jnp.int32(4))
    updates, _ = tx.update(grads, tx.init(vparams), vparams)
    p_got = optax.apply_updates(vparams, updates)

    np.testing.assert_allclose(float(loss_got), float(loss_ref), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

"""Fused LSTM-chain kernels vs the XLA scan (interpret mode)."""

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

"""Chunked best-loss pretraining == the per-step path (artifacts + math).

The reference reads the loss and best-loss-checkpoints after every
minibatch (trainers.py:182-186, 244-248, 293-297 — quirk Q12);
``steps.make_{reward,policy,value}_chunk_step`` scan k updates per host
dispatch carrying (best_loss, params-entering-best) on device. These
tests pin the equivalence: same losses in the same order, same final
parameters, same checkpoint artifact (weights entering the first
minibatch attaining the global-minimum loss).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
from image_captioning_through_rl_tpu.models import policy as policy_mod
from image_captioning_through_rl_tpu.models import reward as reward_mod
from image_captioning_through_rl_tpu.models import value as value_mod
from image_captioning_through_rl_tpu.train import checkpoint as ckpt
from image_captioning_through_rl_tpu.train import steps
from image_captioning_through_rl_tpu.train.loops import (
    train_policy_network,
    train_reward_network,
)
from image_captioning_through_rl_tpu.train.optim import adam

CFG = NetConfig(vocab_size=29, input_dim=12, wordvec_dim=10, hidden_dim=12,
                max_seq_len=8)
K = 5


def _minibatches(rng_np, k, n):
    feats = rng_np.standard_normal((k, n, CFG.input_dim)).astype(np.float32)
    caps = rng_np.integers(4, CFG.vocab_size, size=(k, n, CFG.max_seq_len))
    caps = caps.astype(np.int32)
    caps[:, :, 0] = 1
    caps[:, :, -1] = 2
    return jnp.asarray(feats), jnp.asarray(caps)


def _tree_close(a, b, **kw):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), **kw)


def test_policy_chunk_matches_per_step(rng_np):
    params = policy_mod.init(jax.random.PRNGKey(0), CFG)
    tx = adam(1e-3, params, False)
    feats, caps = _minibatches(rng_np, K, 6)

    # per-step reference trace
    step = steps.make_policy_step(CFG, tx)
    p, o = params, tx.init(params)
    losses, entering = [], []
    for j in range(K):
        entering.append(p)
        p, o, loss = step(p, o, feats[j], caps[j])
        losses.append(float(loss))

    chunk = steps.make_policy_chunk_step(CFG, tx)
    # the chunk donates params/opt — hand it copies so the per-step
    # trace above stays alive for comparison
    params_c = jax.tree.map(jnp.array, params)
    cp, co, closs, best_prev, best, improved = chunk(
        params_c, tx.init(params), jnp.float32(np.inf), feats, caps)

    np.testing.assert_allclose(np.asarray(closs), np.asarray(losses),
                               rtol=2e-6, atol=1e-7)
    _tree_close(cp, p, rtol=2e-5, atol=1e-7)
    assert bool(improved)
    # best_prev = weights entering the FIRST minibatch attaining the min
    j_best = int(np.argmin(losses))
    assert float(best) == float(np.min(np.asarray(closs)))
    _tree_close(best_prev, entering[j_best], rtol=2e-5, atol=1e-7)


def test_chunk_no_improvement_flag(rng_np):
    params = reward_mod.init(jax.random.PRNGKey(1), CFG)
    tx = adam(1e-4, params, False)
    feats, caps = _minibatches(rng_np, 3, 6)
    chunk = steps.make_reward_chunk_step(CFG, tx)
    _, _, closs, _, best, improved = chunk(
        params, tx.init(params), jnp.float32(-1.0), feats, caps)
    assert not bool(improved)
    assert float(best) == -1.0  # untouched: every loss >= the bar


def test_value_chunk_matches_per_step(rng_np):
    vparams = value_mod.init(jax.random.PRNGKey(2), CFG)
    pparams = policy_mod.init(jax.random.PRNGKey(3), CFG)
    rparams = reward_mod.init(jax.random.PRNGKey(4), CFG)
    tx = adam(1e-3, vparams, False)
    feats, caps = _minibatches(rng_np, 4, 6)
    prefix_lens = np.array([1, 5, 3, 7], np.int32)

    step = steps.make_value_step(CFG, tx)
    p, o = vparams, tx.init(vparams)
    losses = []
    for j in range(4):
        p, o, loss = step(p, o, pparams, rparams, feats[j], caps[j],
                          int(prefix_lens[j]))
        losses.append(float(loss))

    chunk = steps.make_value_chunk_step(CFG, tx)
    cp, _, closs, _, _, _ = chunk(
        vparams, tx.init(vparams), jnp.float32(np.inf), pparams, rparams,
        feats, caps, jnp.asarray(prefix_lens))
    np.testing.assert_allclose(np.asarray(closs), np.asarray(losses),
                               rtol=2e-6, atol=1e-7)
    _tree_close(cp, p, rtol=2e-5, atol=1e-7)


def _mini_cfg(monkeypatch):
    import image_captioning_through_rl_tpu.train.loops as loops

    monkeypatch.setattr(
        loops, "_cfg_for",
        lambda d, b, nd=None: NetConfig.for_vocab(
            d.word_to_idx, d.embeddings, bidirectional=b,
            input_dim=16, wordvec_dim=8, hidden_dim=8),
    )


def test_trainer_chunked_vs_per_step_artifacts(tmp_path, monkeypatch):
    """End-to-end: the policy trainer writes the same checkpoint and
    returns the same final weights whether dispatches are chunked."""
    coco = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=16,
                               num_val_images=4, vocab_size=30,
                               feature_dim=16, seed=7)
    data = load_data(coco)
    _mini_cfg(monkeypatch)

    outs = {}
    for label, k in (("per_step", 1), ("chunked", 3)):
        paths = {"policy_network": str(tmp_path / f"policy_{label}.ckpt")}
        params = train_policy_network(
            data, paths, None, False, epochs=2, batch_size=8, seed=3,
            chunk_steps=k)
        assert os.path.exists(paths["policy_network"])
        outs[label] = (params, ckpt.load_pytree(params, paths["policy_network"]))

    _tree_close(outs["per_step"][0], outs["chunked"][0], rtol=2e-5, atol=1e-7)
    _tree_close(outs["per_step"][1], outs["chunked"][1], rtol=2e-5, atol=1e-7)


def test_reward_trainer_chunked_vs_per_step(tmp_path, monkeypatch):
    coco = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=16,
                               num_val_images=4, vocab_size=30,
                               feature_dim=16, seed=9)
    data = load_data(coco)
    _mini_cfg(monkeypatch)

    outs = {}
    for label, k in (("per_step", 1), ("chunked", 4)):
        paths = {"reward_network": str(tmp_path / f"reward_{label}.ckpt")}
        params = train_reward_network(
            data, paths, None, False, epochs=2, batch_size=8, seed=3,
            chunk_steps=k)
        outs[label] = (params, ckpt.load_pytree(params, paths["reward_network"]))

    _tree_close(outs["per_step"][0], outs["chunked"][0], rtol=2e-5, atol=1e-7)
    _tree_close(outs["per_step"][1], outs["chunked"][1], rtol=2e-5, atol=1e-7)

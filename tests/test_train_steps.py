"""Training steps: loss semantics and optimization progress on tiny data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c, policy, reward, value
from image_captioning_through_rl_tpu.train import optim, steps

from torch_oracles import rand_captions, rand_features

VOCAB = 30
CFG = NetConfig(vocab_size=VOCAB, input_dim=10, wordvec_dim=12, hidden_dim=14, max_seq_len=9)
N = 8


@pytest.fixture
def batch(rng_np):
    feats = jnp.asarray(rand_features(rng_np, N, CFG.input_dim))
    caps = jnp.asarray(rand_captions(rng_np, N, CFG.max_seq_len, VOCAB).astype(np.int32))
    return feats, caps


def _run_steps(step_fn, params, opt_state, args, n=30):
    losses = []
    for _ in range(n):
        params, opt_state, loss = step_fn(params, opt_state, *args)
        losses.append(float(loss))
    return params, losses


def test_reward_step_decreases_vse_loss(batch):
    feats, caps = batch
    params = reward.init(jax.random.PRNGKey(0), CFG)
    tx = optim.adam(1e-3)
    step = steps.make_reward_step(CFG, tx)
    _, losses = _run_steps(step, params, tx.init(params), (feats, caps))
    assert losses[-1] < losses[0]


def test_reward_step_compat_mode_runs(batch):
    feats, caps = batch
    params = reward.init(jax.random.PRNGKey(0), CFG)
    tx = optim.adam(1e-3)
    step = steps.make_reward_step(CFG, tx, compat=True)
    _, losses = _run_steps(step, params, tx.init(params), (feats, caps), n=5)
    assert np.isfinite(losses).all()


def test_policy_step_decreases_xe_loss(batch):
    feats, caps = batch
    params = policy.init(jax.random.PRNGKey(1), CFG)
    tx = optim.adam(1e-2)
    step = steps.make_policy_step(CFG, tx)
    _, losses = _run_steps(step, params, tx.init(params), (feats, caps), n=40)
    assert losses[-1] < 0.5 * losses[0]


def test_value_step_decreases_mse(batch):
    feats, caps = batch
    pparams = policy.init(jax.random.PRNGKey(2), CFG)
    rparams = reward.init(jax.random.PRNGKey(3), CFG)
    vparams = value.init(jax.random.PRNGKey(4), CFG)
    tx = optim.adam(1e-2)
    step = steps.make_value_step(CFG, tx)
    opt_state = tx.init(vparams)
    losses = []
    for i in range(30):
        vparams, opt_state, loss = step(
            vparams, opt_state, pparams, rparams, feats, caps, jnp.int32(1 + i % CFG.max_seq_len)
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[-5:]) < losses[0]


def test_a2c_step_runs_and_is_finite(batch):
    feats, caps = batch
    params = a2c.init(jax.random.PRNGKey(5), CFG)
    rparams = reward.init(jax.random.PRNGKey(6), CFG)
    tx = optim.adam(1e-4)
    step = steps.make_a2c_step(CFG, tx)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(7)
    for i in range(5):
        key, sub = jax.random.split(key)
        params, opt_state, stats = step(
            params, opt_state, rparams, feats, caps, jnp.int32(1), sub
        )
        assert np.isfinite(float(stats.loss))
        assert np.isfinite(float(stats.mean_reward))


def test_a2c_rollout_mask_matches_caplen(batch):
    """Only caplen-1 steps contribute in plain mode; level steps in
    curriculum mode."""
    feats, caps = batch
    params = a2c.init(jax.random.PRNGKey(8), CFG)
    rparams = reward.init(jax.random.PRNGKey(9), CFG)
    caplen = int(jnp.max(steps.batch_caption_lens(caps)))

    # curriculum window [curr_seq_len, caplen-1]: level steps valid
    level = 2
    curr_seq_len = caplen - level
    loss, stats = steps.a2c_rollout_loss(
        params, CFG, rparams, feats, caps,
        jnp.int32(curr_seq_len), jnp.int32(caplen), jax.random.PRNGKey(0),
        per_step_mean=True,
    )
    assert np.isfinite(float(loss))

    # plain mode equals curriculum with curr_seq_len=1 and per_step_mean off
    loss_p, _ = steps.a2c_rollout_loss(
        params, CFG, rparams, feats, caps,
        jnp.int32(1), jnp.int32(caplen), jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss_p))


def test_a2c_gradients_reach_both_networks(batch):
    """The actor loss must backprop into the value net too (the reference
    takes no stop_gradient on the advantage, trainers.py:471-473)."""
    feats, caps = batch
    params = a2c.init(jax.random.PRNGKey(10), CFG)
    rparams = reward.init(jax.random.PRNGKey(11), CFG)
    caplen = jnp.max(steps.batch_caption_lens(caps))
    grads = jax.grad(
        lambda p: steps.a2c_rollout_loss(
            p, CFG, rparams, feats, caps, jnp.int32(1), caplen, jax.random.PRNGKey(1)
        )[0]
    )(params)
    v_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["value"]))
    p_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["policy"]))
    assert v_norm > 0
    assert p_norm > 0


def test_frozen_embeddings_stay_fixed(batch):
    feats, caps = batch
    emb = np.random.default_rng(0).standard_normal((VOCAB, CFG.wordvec_dim)).astype(np.float32)
    cfg = NetConfig(
        vocab_size=VOCAB, input_dim=10, wordvec_dim=12, hidden_dim=14,
        max_seq_len=9, freeze_embeddings=True,
    )
    params = policy.init(jax.random.PRNGKey(12), cfg, pretrained_embeddings=emb)
    tx = optim.adam(1e-2, params, freeze_embeddings=True)
    step = steps.make_policy_step(cfg, tx)
    new_params, _, _ = step(params, tx.init(params), feats, caps)
    np.testing.assert_array_equal(np.asarray(new_params["embedding"]), emb)
    assert not np.allclose(
        np.asarray(new_params["head"]["w"]), np.asarray(params["head"]["w"])
    )


@pytest.mark.slow
def test_a2c_chunk_curriculum_matches_single_steps_and_skips(rng_np):
    """The curriculum chunk step must equal running the same minibatches
    through single steps with the same per-slot keys, and must skip
    (no update, valid=False) minibatches whose curr_seq_len < 1
    (reference trainers.py:550)."""
    level = 4
    k = 3
    feats = jnp.asarray(rand_features(rng_np, k * N, CFG.input_dim))
    caps_np = rand_captions(rng_np, k * N, CFG.max_seq_len, VOCAB).astype(np.int32)
    # minibatch 1: every caption ends at position <= level -> caplen - level < 1
    caps_np[N : 2 * N, 1:] = 0
    caps_np[N : 2 * N, 2] = 2  # <END> at position 2 -> caplen = 3 < level+1
    # minibatches 0, 2: guarantee a long caption so caplen - level >= 1
    caps_np[0, :] = np.arange(CFG.max_seq_len) % (VOCAB - 4) + 4
    caps_np[0, 0] = 1
    caps_np[0, -1] = 2
    caps_np[2 * N, :] = caps_np[0, :]
    caps = jnp.asarray(caps_np)

    params = a2c.init(jax.random.PRNGKey(0), CFG)
    rparams = reward.init(jax.random.PRNGKey(1), CFG)
    tx = optim.adam(1e-3)

    key = jax.random.PRNGKey(9)

    # oracle first (the chunk step donates its params/opt-state buffers):
    # single steps on slots 0 and 2 with the chunk's slot keys
    step = steps.make_a2c_step(CFG, tx, per_step_mean=True)
    keys = jax.random.split(key, k)
    p, o = params, tx.init(params)
    oracle_losses = {}
    for j in (0, 2):
        f_j = feats[j * N : (j + 1) * N]
        c_j = caps[j * N : (j + 1) * N]
        caplen = int(np.max(np.argmax(np.asarray(c_j) == 2, axis=1)) + 1)
        p, o, stats_j = step(p, o, rparams, f_j, c_j, jnp.int32(caplen - level), keys[j])
        oracle_losses[j] = float(stats_j.loss)

    chunk_fn = steps.make_a2c_chunk_step(CFG, tx, per_step_mean=True, curriculum=True)
    got_params, _, got_stats, valid = chunk_fn(
        params, tx.init(params), rparams,
        feats.reshape(k, N, -1), caps.reshape(k, N, -1), jnp.int32(level), keys,
    )
    np.testing.assert_array_equal(np.asarray(valid), [True, False, True])
    assert float(got_stats.loss[1]) == 0.0  # skipped slot reports zeros
    for j in (0, 2):
        np.testing.assert_allclose(
            float(got_stats.loss[j]), oracle_losses[j], rtol=1e-5, atol=1e-6
        )
    for a, b in zip(jax.tree.leaves(got_params), jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_a2c_training_identical_across_chunk_lengths(tmp_path):
    """The A2C epoch loop must be bit-identical for any chunk_steps
    setting: the host derives one rollout key per minibatch with the
    same split discipline whether it dispatches them singly or as
    chunked scans (loops.a2c_training docstring)."""
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.train import loops

    d = make_synthetic_coco(
        str(tmp_path / "coco"), num_train_images=10, num_val_images=4,
        captions_per_image=2, vocab_size=VOCAB, feature_dim=CFG.input_dim, seed=5,
    )
    data = load_data(d)

    def run(chunk_steps):
        params = a2c.init(jax.random.PRNGKey(0), CFG)
        rparams = reward.init(jax.random.PRNGKey(1), CFG)
        tx = optim.adam(1e-3)
        return loops.a2c_training(
            data, params, rparams, tx, tx.init(params), CFG,
            plot_dir=None, save_paths=[], batch_size=6, epochs=2, seed=3,
            chunk_steps=chunk_steps,
        )

    p1 = run(1)   # single-step path (use_chunks False)
    p3 = run(3)   # chunked path, incl. a ragged tail minibatch
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_a2c_curriculum_identical_across_chunk_lengths(tmp_path):
    """Same guarantee for the curriculum loop: skipped minibatches
    consume a key in both the chunked and single-step paths."""
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.train import loops

    d = make_synthetic_coco(
        str(tmp_path / "coco"), num_train_images=10, num_val_images=4,
        captions_per_image=2, vocab_size=VOCAB, feature_dim=CFG.input_dim, seed=6,
    )
    data = load_data(d)

    def run(chunk_steps):
        params = a2c.init(jax.random.PRNGKey(0), CFG)
        rparams = reward.init(jax.random.PRNGKey(1), CFG)
        tx = optim.adam(1e-3)
        return loops.a2c_curriculum_training(
            data, params, rparams, tx, tx.init(params), CFG,
            plot_dir=None, save_paths=[], batch_size=6, epochs=1,
            curriculum=[3, CFG.max_seq_len - 1], seed=4,
            chunk_steps=chunk_steps,
        )

    p1 = run(1)
    p3 = run(3)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

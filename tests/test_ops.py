"""Op-level parity: losses, reward, sampling."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.ops import (
    a2c_losses,
    cosine_embedding_reward,
    log_prob_of,
    sample_categorical,
    visual_semantic_embedding_loss,
    weighted_caption_xe_loss,
)


def _torch_vse_loss(visuals, semantics, beta=0.2):
    """Literal transcription of the reference loss (trainers.py:23-54)."""
    n = visuals.shape[0]
    out = 0.0
    for a, b in ((visuals, semantics), (semantics, visuals)):
        s = a @ b.T
        s = s - torch.diag(s).unsqueeze(1)
        s = s + (beta / n) * (torch.ones(n, n) - torch.eye(n))
        out = out + torch.sum(F.relu(s)) / n
    return out


def test_vse_loss_matches_reference_formula(rng_np):
    v = rng_np.standard_normal((8, 12), dtype=np.float32)
    s = rng_np.standard_normal((8, 12), dtype=np.float32)
    ref = _torch_vse_loss(torch.from_numpy(v), torch.from_numpy(s)).item()
    got = visual_semantic_embedding_loss(jnp.asarray(v), jnp.asarray(s), precision="highest")
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_weighted_xe_matches_reference_loop(rng_np):
    """Reference Q5 loss: per-sample CE truncated at caplen, weighted caplen/N,
    summed (trainers.py:239-242)."""
    n, t, v = 5, 8, 11
    logits = rng_np.standard_normal((n, t - 1, v), dtype=np.float32)
    caps = rng_np.integers(3, v, size=(n, t)).astype(np.int64)
    caps[:, 0] = 1
    end_pos = rng_np.integers(1, t - 1, size=n)
    for i in range(n):
        caps[i, end_pos[i]] = 2
    caplens = np.array([np.nonzero(caps[i] == 2)[0][0] + 1 for i in range(n)])

    tl = torch.from_numpy(logits)
    targets = torch.from_numpy(caps[:, 1:])
    ref = 0.0
    for i in range(n):
        cl = int(caplens[i])
        ref += (cl / n) * F.cross_entropy(tl[i][:cl], targets[i][:cl])
    got = weighted_caption_xe_loss(jnp.asarray(logits), jnp.asarray(caps[:, 1:]), jnp.asarray(caplens))
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-5)


def test_cosine_reward_matches_torch(rng_np):
    ve = rng_np.standard_normal((6, 10), dtype=np.float32)
    se = rng_np.standard_normal((6, 10), dtype=np.float32)
    ref = torch.sum(
        F.normalize(torch.from_numpy(ve), p=2, dim=1)
        * F.normalize(torch.from_numpy(se), p=2, dim=1),
        dim=1,
    ).numpy()
    got = cosine_embedding_reward(jnp.asarray(ve), jnp.asarray(se))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_log_prob_of(rng_np):
    logits = rng_np.standard_normal((4, 9), dtype=np.float32)
    actions = rng_np.integers(0, 9, size=4)
    ref = np.log(
        torch.softmax(torch.from_numpy(logits), dim=-1)
        .gather(1, torch.from_numpy(actions).view(-1, 1))
        .numpy()
    )[:, 0]
    got = log_prob_of(jnp.asarray(logits), jnp.asarray(actions))
    # log_softmax vs the reference's log(softmax(.)) differ at float32 ulp level
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_sample_categorical_distribution():
    """Empirical sample frequencies track softmax(logits)."""
    logits = jnp.asarray([2.0, 1.0, 0.0, -1.0])
    n = 20000
    samples = sample_categorical(jax.random.PRNGKey(0), jnp.tile(logits, (n, 1)))
    freq = np.bincount(np.asarray(samples), minlength=4) / n
    expect = np.asarray(jax.nn.softmax(logits))
    np.testing.assert_allclose(freq, expect, atol=0.02)


def test_a2c_losses_match_reference_formula(rng_np):
    """Plain A2C losses (trainers.py:471-473): A = V - r,
    actor = mean(-logp*A), critic = 0.5*mean(A^2)."""
    n, s = 4, 6
    values = rng_np.standard_normal((n, s), dtype=np.float32)
    rewards = rng_np.standard_normal((n, s), dtype=np.float32)
    logp = rng_np.standard_normal((n, s), dtype=np.float32)
    adv = values - rewards
    ref_actor = float(np.mean(-logp * adv))
    ref_critic = float(0.5 * np.mean(adv**2))
    actor, critic = a2c_losses(jnp.asarray(values), jnp.asarray(rewards), jnp.asarray(logp))
    np.testing.assert_allclose(float(actor), ref_actor, rtol=1e-5)
    np.testing.assert_allclose(float(critic), ref_critic, rtol=1e-5)

    # curriculum variant (trainers.py:581-584): mean over steps, then batch
    ref_actor_c = float(np.mean(np.mean(-logp * adv, axis=1)))
    actor_c, _ = a2c_losses(
        jnp.asarray(values), jnp.asarray(rewards), jnp.asarray(logp), per_step_mean=True
    )
    np.testing.assert_allclose(float(actor_c), ref_actor_c, rtol=1e-5)

    # masked: only first k steps valid
    mask = np.zeros((n, s), dtype=np.float32)
    mask[:, :3] = 1.0
    ref_actor_m = float(np.mean(-logp[:, :3] * adv[:, :3]))
    actor_m, _ = a2c_losses(
        jnp.asarray(values), jnp.asarray(rewards), jnp.asarray(logp), step_mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(actor_m), ref_actor_m, rtol=1e-5)

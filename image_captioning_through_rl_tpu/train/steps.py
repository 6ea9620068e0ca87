"""Jitted training steps for the four networks.

Each trainer in the reference is an eager Python loop with per-step
host<->device traffic (reference trainers.py); here each minibatch is a
single compiled XLA program:

  * :func:`reward_step` — VSE ranking loss (trainers.py:260-309).
  * :func:`policy_step` — length-weighted XE (trainers.py:202-257).
  * :func:`value_step` — MSE against the embedding reward of a
    greedy-decoded caption, on a random-length prefix
    (trainers.py:125-199).
  * :func:`a2c_step` — the full A2C rollout: on-chip sampling, reward
    and value on the growing prefix, advantage losses, Adam update —
    one ``lax.scan``, zero host syncs (vs. trainers.py:441-480 which
    round-trips probabilities to numpy every token, quirk Q3).

All steps use fixed shapes: dynamic quantities (caption length, prefix
length, curriculum window) are traced scalars entering only as masks or
dynamic indices, so each function compiles exactly once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import END_ID
from ..config import NetConfig
from ..models import policy as policy_mod
from ..models import reward as reward_mod
from ..models import value as value_mod
from ..ops.linalg import dense
from ..ops.losses import a2c_losses, visual_semantic_embedding_loss, weighted_caption_xe_loss
from ..ops.reward_ops import cosine_embedding_reward
from ..ops.rnn import lstm_cell, lstm_scan
from ..ops.sampling import log_prob_of, sample_categorical


def batch_caption_lens(captions: jax.Array) -> jax.Array:
    """END position + 1 per row, as a traced value (cf. trainers.py:241)."""
    return jnp.argmax(captions == END_ID, axis=1) + 1


# --------------------------------------------------------------------------
# Reward network (VSE loss)
# --------------------------------------------------------------------------

def reward_loss(params, cfg: NetConfig, features, captions, beta=0.2, compat=False):
    if compat:
        # The reference resets the GRU's persistent hidden after every
        # minibatch (trainers.py:307), so within one step the compat
        # carry always starts at zero.
        (ve, se), _ = reward_mod.forward_compat(
            params, cfg, features, captions, reward_mod.compat_zero_state(cfg)
        )
    else:
        ve, se = reward_mod.forward(params, cfg, features, captions)
    return visual_semantic_embedding_loss(ve, se, beta=beta, precision=cfg.precision)


def reward_loss_fused(params, cfg: NetConfig, features, captions, beta=0.2,
                      block_n: int = 128, weight_dtype=None, interpret: bool = False):
    """:func:`reward_loss` with the GRU chain fused into Pallas kernels
    (ops/pallas_gru.py); the embedding pair + VSE loss stay in XLA."""
    from ..ops.pallas_gru import fused_gru_chain

    n = captions.shape[0]
    hs = fused_gru_chain(
        params["gru"], params["embedding"], captions,
        jnp.zeros((n, cfg.hidden_dim), jnp.float32),
        block_n=block_n,
        weight_dtype=jnp.bfloat16 if weight_dtype is None else weight_dtype,
        interpret=interpret,
    )
    ve, se = reward_mod.embed_pair(params, cfg, features, hs[:, -1])
    return visual_semantic_embedding_loss(ve, se, beta=beta, precision=cfg.precision)


def make_reward_step(cfg: NetConfig, tx: optax.GradientTransformation, beta=0.2,
                     compat=False, fused: bool = False):
    """``fused=True`` routes the GRU chain through the Pallas kernels
    (TPU, unidirectional, non-compat)."""
    if fused and (compat or cfg.bidirectional):
        raise ValueError("fused reward step is unidirectional, non-compat only")
    if fused:
        def loss_call(params, features, captions):
            return reward_loss_fused(params, cfg, features, captions, beta=beta)
    else:
        def loss_call(params, features, captions):
            return reward_loss(params, cfg, features, captions, beta=beta, compat=compat)

    @jax.jit
    def step(params, opt_state, features, captions):
        loss, grads = jax.value_and_grad(loss_call)(params, features, captions)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


# --------------------------------------------------------------------------
# Policy network (teacher-forced XE)
# --------------------------------------------------------------------------

def policy_loss(params, cfg: NetConfig, features, captions, caplens):
    logits = policy_mod.forward(params, cfg, features, captions[:, :-1])
    return weighted_caption_xe_loss(logits, captions[:, 1:], caplens)


def policy_loss_fused(params, cfg: NetConfig, features, captions, caplens,
                      block_n: int = 128, weight_dtype=None, interpret: bool = False):
    """:func:`policy_loss` with the LSTM chain fused into Pallas kernels
    (ops/pallas_lstm.py). The vocab head, XE loss, and their backward
    remain single big XLA matmuls over the [N*T] axis."""
    from ..ops.pallas_lstm import fused_lstm_chain

    h0 = dense(features, params["cnn2linear"], precision=cfg.precision)
    hs = fused_lstm_chain(
        params["lstm"], params["embedding"], captions[:, :-1],
        h0, jnp.zeros_like(h0),
        block_n=block_n,
        weight_dtype=jnp.bfloat16 if weight_dtype is None else weight_dtype,
        interpret=interpret,
    )
    logits = dense(hs, params["head"], precision=cfg.precision)
    return weighted_caption_xe_loss(logits, captions[:, 1:], caplens)


def make_policy_step(cfg: NetConfig, tx: optax.GradientTransformation, fused: bool = False):
    """``fused=True`` routes the LSTM chain through the Pallas kernels
    (TPU, unidirectional)."""
    if fused and cfg.bidirectional:
        raise ValueError("fused policy step is unidirectional only")
    loss_fn = policy_loss_fused if fused else policy_loss

    @jax.jit
    def step(params, opt_state, features, captions):
        caplens = batch_caption_lens(captions)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, cfg, features, captions, caplens
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


# --------------------------------------------------------------------------
# Value network (MSE vs embedding reward of greedy rollouts)
# --------------------------------------------------------------------------

def make_a2c_chunk_step(
    cfg: NetConfig,
    tx: optax.GradientTransformation,
    per_step_mean: bool = False,
    curriculum: bool = False,
    fused: bool = False,
):
    """Chunked A2C update: ``k`` minibatch steps inside one jitted scan.

    One host dispatch drives k optimizer steps; per-minibatch stats come
    back stacked, and the chunk consumes host-provided per-minibatch
    keys (``rngs: [k]``) drawn with the same split discipline as the
    single-step loop — so a chunked run's trajectories, losses, scalars
    and checkpoints are IDENTICAL to ``chunk_steps=1`` with the same
    seed; only host dispatch overhead is amortized. (Plain A2C has no
    per-minibatch checkpointing; best-loss-checkpointed trainers use
    their own chunk steps with on-device Q12 bookkeeping.)

    ``curriculum=True`` changes the sixth argument from ``curr_seq_len``
    to the curriculum ``level``: each minibatch derives its own
    ``curr_seq_len = caplen - level`` on device, and minibatches with
    ``curr_seq_len < 1`` are skipped exactly like the reference's
    ``continue`` (trainers.py:550) — no parameter/optimizer update, and
    a ``False`` entry in the returned validity mask so the host logs
    nothing for them. Returns ``(params, opt_state, stats, valid)``.

    ``fused=True`` drives each minibatch through the Pallas rollout
    kernels (TPU, unidirectional).
    """
    if fused:
        if cfg.bidirectional:
            raise ValueError("fused rollout is unidirectional only")
        rollout = a2c_rollout_loss_fused
    else:
        rollout = a2c_rollout_loss_full if cfg.bidirectional else a2c_rollout_loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk(a2c_params, opt_state, reward_params, features, captions, curr_or_level, rngs):
        # features: [k, N, F], captions: [k, N, T]; rngs: [k] stacked
        # per-minibatch keys. The host derives them with the SAME
        # split-per-minibatch discipline as the single-step loop, so a
        # chunked run consumes an identical PRNG stream (identical
        # trajectories/artifacts) to chunk_steps=1 with the same seed.
        keys = rngs

        def body(carry, inp):
            params, opt_state = carry
            feats_b, caps_b, key = inp
            caplen = jnp.max(batch_caption_lens(caps_b))
            curr_seq_len = caplen - curr_or_level if curriculum else curr_or_level

            def do_update(operand):
                params, opt_state = operand
                (loss, stats), grads = jax.value_and_grad(rollout, has_aux=True)(
                    params, cfg, reward_params, feats_b, caps_b,
                    curr_seq_len, caplen, key, per_step_mean=per_step_mean,
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), stats

            if not curriculum:
                (params, opt_state), stats = do_update((params, opt_state))
                return (params, opt_state), (stats, jnp.bool_(True))

            def skip(operand):
                z = jnp.float32(0.0)
                return operand, RolloutStats(z, z, z, z, z)

            valid = curr_seq_len >= 1
            (params, opt_state), stats = jax.lax.cond(
                valid, do_update, skip, (params, opt_state)
            )
            return (params, opt_state), (stats, valid)

        (a2c_params, opt_state), (stats, valid) = jax.lax.scan(
            body, (a2c_params, opt_state), (features, captions, keys)
        )
        return a2c_params, opt_state, stats, valid  # stats leaves: [k]

    return chunk


def make_value_step(cfg: NetConfig, tx: optax.GradientTransformation, compat: bool = False,
                    fused: bool = False, chunked: bool = False):
    """Builder. The returned step takes the *frozen* policy and reward
    parameters as explicit arguments (they are loaded, not trained —
    reference trainers.py:140-150).

    Unidirectional: one compile; the random prefix length enters as a
    dynamic index into the encoder's collected hidden states.
    Bidirectional: the prefix length is a static argument (the backward
    scan's extent depends on it) — at most ``max_seq_len`` cached
    variants. ``compat`` selects reference-exact batch-as-time encoders
    (quirk Q1; hiddens reset per minibatch as in trainers.py:196-197).
    ``chunked=True`` returns the raw (unjitted) update for
    :func:`make_value_chunk_step` to scan.
    """
    if fused and (compat or cfg.bidirectional):
        raise ValueError("fused value step is unidirectional, non-compat only")
    if chunked and (compat or cfg.bidirectional):
        raise ValueError("chunked value step is unidirectional, non-compat only")
    if compat:
        return _make_value_step_compat(cfg, tx)
    if cfg.bidirectional:
        return _make_value_step_bidirectional(cfg, tx)

    def update(vparams, opt_state, pparams, rparams, features, captions, prefix_len):
        loss, grads = jax.value_and_grad(value_episode_loss)(
            vparams, cfg, pparams, rparams, features, captions, prefix_len,
            fused=fused,
        )
        updates, opt_state = tx.update(grads, opt_state, vparams)
        return optax.apply_updates(vparams, updates), opt_state, loss

    if chunked:
        return update
    return jax.jit(update)


def value_episode_loss(vparams, cfg: NetConfig, pparams, rparams,
                       features, captions, prefix_len,
                       fused: bool = False, interpret: bool = False):
    """The value trainer's per-minibatch loss (unidirectional,
    non-compat): greedy-rollout the frozen policy, score the rollout
    with the frozen reward net (stop-gradient), and regress the value
    of the random-length prefix onto that reward (trainers.py:125-199).

    Factored out of :func:`make_value_step` so gradient-level probes can
    differentiate the exact served loss; ``fused`` swaps in the Pallas
    greedy-decode and LSTM-chain kernels.
    """
    from ..decode.greedy import greedy_decode

    if fused:
        # the rollout is frozen-policy + stop-gradient: serve it with
        # the fused greedy kernel (same decode the serving path uses)
        from ..ops.pallas_decode import fused_greedy_decode

        gen_caps = fused_greedy_decode(
            pparams, features, captions[:, 0], max_len=cfg.max_seq_len,
            interpret=interpret,
        )
    else:
        gen_caps = greedy_decode(pparams, cfg, features, captions[:, 0])
    ve, se = reward_mod.forward(rparams, cfg, features, gen_caps)
    rewards = cosine_embedding_reward(ve, se)[:, None]  # [N, 1]
    rewards = jax.lax.stop_gradient(rewards)

    # Value of ``gen_caps[:, :prefix_len]`` vs the full-caption reward.
    # The reference evaluates ``V`` on a random-length prefix (shared by
    # the whole batch, trainers.py:177). Under jit we scan the encoder
    # over the full caption and pick the hidden state at
    # ``prefix_len - 1`` with a dynamic index — same value, one compile.
    n = gen_caps.shape[0]
    zeros = jnp.zeros((n, cfg.hidden_dim), jnp.float32)
    if fused:
        from ..ops.pallas_lstm import fused_lstm_chain

        hs_nt = fused_lstm_chain(
            vparams["lstm"], vparams["embedding"], gen_caps, zeros, zeros,
            interpret=interpret)
        h = jax.lax.dynamic_index_in_dim(hs_nt, prefix_len - 1, axis=1, keepdims=False)
    else:
        xs = jnp.swapaxes(vparams["embedding"][gen_caps], 0, 1)  # [T, N, E]
        hs, _ = lstm_scan(vparams["lstm"], xs, (zeros, zeros), precision=cfg.precision)
        h = jax.lax.dynamic_index_in_dim(hs, prefix_len - 1, axis=0, keepdims=False)
    values = value_mod.value_head(vparams, cfg, features, h)  # [N, 1]
    return jnp.mean(jnp.square(values - rewards))


def _make_value_step_compat(cfg: NetConfig, tx: optax.GradientTransformation):

    from ..decode.greedy import greedy_decode

    def loss_fn(vparams, features, gen_prefix, rewards):
        values, _ = value_mod.forward_compat(
            vparams, cfg, features, gen_prefix, value_mod.compat_zero_state(cfg)
        )
        return jnp.mean(jnp.square(values - rewards))

    @functools.partial(jax.jit, static_argnums=(6,))
    def step(vparams, opt_state, pparams, rparams, features, captions, prefix_len):
        gen_caps = greedy_decode(pparams, cfg, features, captions[:, 0])
        (ve, se), _ = reward_mod.forward_compat(
            rparams, cfg, features, gen_caps, reward_mod.compat_zero_state(cfg)
        )
        rewards = jax.lax.stop_gradient(cosine_embedding_reward(ve, se)[:, None])
        loss, grads = jax.value_and_grad(loss_fn)(
            vparams, features, gen_caps[:, :prefix_len], rewards
        )
        updates, opt_state = tx.update(grads, opt_state, vparams)
        return optax.apply_updates(vparams, updates), opt_state, loss

    return step


def _make_value_step_bidirectional(cfg: NetConfig, tx: optax.GradientTransformation):

    # carried-state greedy is exact for bidirectional policies too
    # (models/policy.py; equality pinned in tests/test_bidirectional.py)
    # and replaces the O(T^2) full-prefix re-encode in this rollout
    from ..decode.greedy import greedy_decode

    def loss_fn(vparams, features, gen_prefix, rewards):
        values = value_mod.forward(vparams, cfg, features, gen_prefix)
        return jnp.mean(jnp.square(values - rewards))

    @functools.partial(jax.jit, static_argnums=(6,))
    def step(vparams, opt_state, pparams, rparams, features, captions, prefix_len):
        gen_caps = greedy_decode(pparams, cfg, features, captions[:, 0])
        ve, se = reward_mod.forward(rparams, cfg, features, gen_caps)
        rewards = jax.lax.stop_gradient(cosine_embedding_reward(ve, se)[:, None])
        loss, grads = jax.value_and_grad(loss_fn)(
            vparams, features, gen_caps[:, :prefix_len], rewards
        )
        updates, opt_state = tx.update(grads, opt_state, vparams)
        return optax.apply_updates(vparams, updates), opt_state, loss

    return step


# --------------------------------------------------------------------------
# Chunked best-loss pretraining (k minibatch updates per host dispatch)
# --------------------------------------------------------------------------

def _best_loss_scan(upd, params, opt_state, best_loss, xs):
    """Scan ``upd`` over k stacked minibatches carrying the running best
    loss and the parameters ENTERING the best minibatch (quirk Q12).

    The reference reads the loss after every minibatch and re-saves the
    checkpoint on each improvement (trainers.py:182-186, 244-248,
    293-297). Only the final write to the checkpoint path is observable,
    and it holds the weights entering the FIRST minibatch attaining the
    global minimum loss (strict ``<``: later ties don't save). Carrying
    ``(best_loss, params_entering_best)`` through the scan preserves
    that artifact byte-for-byte while amortizing the host round trip —
    on a tunneled chip the per-dispatch RTT dominates the 2-4 ms device
    step, so k=8 cuts pretraining wall time close to 8x.

    Returns ``(params, opt_state, losses [k], best_prev, best_loss,
    improved)``; the host saves ``best_prev`` iff ``improved``.
    """
    def body(carry, x):
        params, opt_state, best, best_prev, improved = carry
        prev = params
        params, opt_state, loss = upd(params, opt_state, x)
        take = loss < best
        best = jnp.where(take, loss, best)
        best_prev = jax.tree.map(
            lambda bp, pv: jnp.where(take, pv, bp), best_prev, prev
        )
        return (params, opt_state, best, best_prev,
                jnp.logical_or(improved, take)), loss

    init = (params, opt_state, best_loss, params, jnp.bool_(False))
    (params, opt_state, best, best_prev, improved), losses = jax.lax.scan(
        body, init, xs
    )
    return params, opt_state, losses, best_prev, best, improved


def make_reward_chunk_step(cfg: NetConfig, tx: optax.GradientTransformation,
                           beta=0.2, fused: bool = False):
    """Chunked :func:`make_reward_step` (non-compat, unidirectional).

    ``chunk(params, opt_state, best_loss, features [k,N,F],
    captions [k,N,T])`` -> ``(params, opt_state, losses, best_prev,
    best_loss, improved)``.
    """
    if cfg.bidirectional:
        raise ValueError("chunked reward step is unidirectional only")
    loss_fn = reward_loss_fused if fused else reward_loss

    def upd(params, opt_state, x):
        features, captions = x
        loss, grads = jax.value_and_grad(loss_fn)(
            params, cfg, features, captions, beta=beta
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk(params, opt_state, best_loss, features, captions):
        return _best_loss_scan(upd, params, opt_state, best_loss,
                               (features, captions))

    return chunk


def make_policy_chunk_step(cfg: NetConfig, tx: optax.GradientTransformation,
                           fused: bool = False):
    """Chunked :func:`make_policy_step` (unidirectional)."""
    if cfg.bidirectional:
        raise ValueError("chunked policy step is unidirectional only")
    loss_fn = policy_loss_fused if fused else policy_loss

    def upd(params, opt_state, x):
        features, captions = x
        caplens = batch_caption_lens(captions)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, cfg, features, captions, caplens
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk(params, opt_state, best_loss, features, captions):
        return _best_loss_scan(upd, params, opt_state, best_loss,
                               (features, captions))

    return chunk


def make_value_chunk_step(cfg: NetConfig, tx: optax.GradientTransformation,
                          fused: bool = False):
    """Chunked :func:`make_value_step` (non-compat, unidirectional).

    The per-minibatch random prefix lengths (trainers.py:177) enter as a
    ``[k]`` int array so the host RNG stream matches the single-step
    path draw-for-draw.
    """
    update = make_value_step(cfg, tx, fused=fused, chunked=True)

    def upd_with(pparams, rparams):
        def upd(params, opt_state, x):
            features, captions, prefix_len = x
            return update(params, opt_state, pparams, rparams,
                          features, captions, prefix_len)
        return upd

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk(params, opt_state, best_loss, pparams, rparams,
              features, captions, prefix_lens):
        return _best_loss_scan(
            upd_with(pparams, rparams), params, opt_state, best_loss,
            (features, captions, prefix_lens),
        )

    return chunk


# --------------------------------------------------------------------------
# A2C (joint actor-critic with on-chip rollout)
# --------------------------------------------------------------------------

class RolloutStats(NamedTuple):
    loss: jax.Array
    actor_loss: jax.Array
    critic_loss: jax.Array
    mean_reward: jax.Array
    mean_advantage: jax.Array


def a2c_rollout_loss(
    a2c_params: dict,
    cfg: NetConfig,
    reward_params: dict,
    features: jax.Array,
    captions: jax.Array,
    curr_seq_len: jax.Array,
    caplen: jax.Array,
    rng: jax.Array,
    per_step_mean: bool = False,
) -> Tuple[jax.Array, RolloutStats]:
    """Loss of one A2C episode batch, as a single scan.

    Plain training (trainers.py:402-500) is the special case
    ``curr_seq_len = 1``: roll out from the <START> column for
    ``caplen - 1`` steps. Curriculum training (trainers.py:503-616)
    teacher-forces the ground-truth prefix of length ``curr_seq_len =
    caplen - level`` and rolls out the final ``level`` tokens. Both are
    the same scan over all T-1 placed positions with a validity mask
    ``curr_seq_len <= p <= caplen - 1``; teacher vs. sampled token
    selection is a ``where`` on the position.

    Per rollout step the reference computes V on the current prefix,
    samples an action from the policy's last-step softmax, and scores
    the extended prefix with the frozen reward net
    (trainers.py:441-459). Carried LSTM/GRU states replace its
    full-prefix re-encodes (exact for unidirectional recurrences).
    """
    pparams, vparams = a2c_params["policy"], a2c_params["value"]
    n, t_max = captions.shape
    steps = t_max - 1

    # States that have consumed position-0 tokens (<START> column).
    start = captions[:, 0]
    pol_state = policy_mod.init_decode_state(pparams, cfg, features)
    pol_state = lstm_cell(
        pparams["lstm"], pparams["embedding"][start], pol_state, precision=cfg.precision
    )
    val_state = value_mod.rnn_step(vparams, cfg, start, value_mod.zero_rnn_state(cfg, n))
    rew_state = reward_mod.rnn_step(
        reward_params, cfg, start, reward_mod.zero_rnn_state(cfg, n)
    )
    ve = dense(features, reward_params["visual_embed"], precision=cfg.precision)
    ve = jax.lax.stop_gradient(ve)

    step_keys = jax.random.split(rng, steps)

    def body(carry, inp):
        pol_state, val_state, rew_state = carry
        p, key, teacher = inp  # position 1..T-1, its rng, ground-truth token

        # logits for position p come from the state that consumed 0..p-1
        logits = dense(pol_state[0], pparams["head"], precision=cfg.precision)
        action = sample_categorical(key, logits)
        logp = log_prob_of(logits, action)

        # critic on the current prefix (before the action is appended)
        value = value_mod.value_from_state(vparams, cfg, features, val_state)[:, 0]

        # reward of prefix + action (frozen net; lookahead GRU step)
        rew_after = reward_mod.rnn_step(reward_params, cfg, action, rew_state)
        se = dense(rew_after, reward_params["semantic_embed"], precision=cfg.precision)
        reward = jax.lax.stop_gradient(cosine_embedding_reward(ve, se))

        # token actually placed at position p: ground truth inside the
        # teacher-forced prefix, the sampled action in the rollout window
        token_in = jnp.where(p < curr_seq_len, teacher, action)

        # advance all encoders with the placed token
        emb_p = pparams["embedding"][token_in]
        pol_state = lstm_cell(pparams["lstm"], emb_p, pol_state, precision=cfg.precision)
        val_state = value_mod.rnn_step(vparams, cfg, token_in, val_state)
        rew_state = reward_mod.rnn_step(reward_params, cfg, token_in, rew_state)

        return (pol_state, val_state, rew_state), (value, reward, logp)

    positions = jnp.arange(1, t_max)
    teachers = jnp.swapaxes(captions[:, 1:], 0, 1)  # [S, N]
    carry0 = (pol_state, val_state, rew_state)
    _, (values, rewards, log_probs) = jax.lax.scan(
        body, carry0, (positions, step_keys, teachers)
    )
    # [S, N] -> [N, S]
    values, rewards, log_probs = (jnp.swapaxes(x, 0, 1) for x in (values, rewards, log_probs))

    p_idx = positions[None, :]  # placed positions 1..T-1
    mask = ((p_idx >= curr_seq_len) & (p_idx <= caplen - 1)).astype(values.dtype)
    mask = jnp.broadcast_to(mask, values.shape)

    actor, critic = a2c_losses(
        values, rewards, log_probs, step_mask=mask, per_step_mean=per_step_mean
    )
    loss = actor + critic
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    stats = RolloutStats(
        loss=loss,
        actor_loss=actor,
        critic_loss=critic,
        mean_reward=jnp.sum(rewards * mask) / denom,
        mean_advantage=jnp.sum((values - rewards) * mask) / denom,
    )
    return loss, stats


def a2c_rollout_loss_full(
    a2c_params: dict,
    cfg: NetConfig,
    reward_params: dict,
    features: jax.Array,
    captions: jax.Array,
    curr_seq_len: jax.Array,
    caplen: jax.Array,
    rng: jax.Array,
    per_step_mean: bool = False,
) -> Tuple[jax.Array, RolloutStats]:
    """Full-prefix rollout loss: the bidirectional-safe variant.

    Bidirectional encoders re-read the whole prefix each step (the
    backward direction has no carryable state), so every rollout step
    re-runs the policy/value/reward forwards on the growing prefix —
    exactly the reference's structure (trainers.py:441-459). The step
    loop is a static Python unroll; each prefix length is its own shape
    inside one compiled graph.
    """
    from ..models import a2c as a2c_mod

    n, t_max = captions.shape
    step_keys = jax.random.split(rng, t_max - 1)

    buf = captions[:, :1]
    values_l, rewards_l, logps_l = [], [], []
    for p in range(1, t_max):
        value, logits = a2c_mod.forward(a2c_params, cfg, features, buf)
        key = step_keys[p - 1]
        action = sample_categorical(key, logits)
        logp = log_prob_of(logits, action)
        token_in = jnp.where(p < curr_seq_len, captions[:, p], action)
        buf = jnp.concatenate([buf, token_in[:, None]], axis=1)
        # reward of prefix + action (the sampled one, as in the reference)
        reward_prefix = jnp.concatenate([buf[:, :-1], action[:, None]], axis=1)
        ve, se = reward_mod.forward(reward_params, cfg, features, reward_prefix)
        reward = jax.lax.stop_gradient(cosine_embedding_reward(ve, se))
        values_l.append(value[:, 0])
        rewards_l.append(reward)
        logps_l.append(logp)

    values = jnp.stack(values_l, axis=1)
    rewards = jnp.stack(rewards_l, axis=1)
    log_probs = jnp.stack(logps_l, axis=1)

    p_idx = jnp.arange(1, t_max)[None, :]
    mask = ((p_idx >= curr_seq_len) & (p_idx <= caplen - 1)).astype(values.dtype)
    mask = jnp.broadcast_to(mask, values.shape)

    actor, critic = a2c_losses(
        values, rewards, log_probs, step_mask=mask, per_step_mean=per_step_mean
    )
    loss = actor + critic
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    stats = RolloutStats(
        loss=loss,
        actor_loss=actor,
        critic_loss=critic,
        mean_reward=jnp.sum(rewards * mask) / denom,
        mean_advantage=jnp.sum((values - rewards) * mask) / denom,
    )
    return loss, stats


def a2c_rollout_loss_compat(
    a2c_params: dict,
    cfg: NetConfig,
    reward_params: dict,
    features: jax.Array,
    captions: jax.Array,
    curr_seq_len: jax.Array,
    caplen: jax.Array,
    rng: jax.Array,
    per_step_mean: bool = False,
) -> Tuple[jax.Array, RolloutStats]:
    """Reference-exact rollout with batch-as-time statefulness (quirk Q1).

    In the reference, the value LSTM's and reward GRU's persistent
    hidden states thread through *every* forward inside a minibatch —
    across the per-column loops of each call and across the rollout
    steps — and reset only at minibatch end (trainers.py:495-496). Here
    the compat carries are threaded explicitly through the unrolled
    rollout, reproducing those numerics for parity testing. Inherently
    sequential (~N·T²/2 cell steps per minibatch); not a training-speed
    path.
    """
    from ..models import policy as pol

    n, t_max = captions.shape
    step_keys = jax.random.split(rng, t_max - 1)

    val_carry = value_mod.compat_zero_state(cfg)
    rew_carry = reward_mod.compat_zero_state(cfg)

    buf = captions[:, :1]
    values_l, rewards_l, logps_l = [], [], []
    for p in range(1, t_max):
        value, val_carry = value_mod.forward_compat(
            a2c_params["value"], cfg, features, buf, val_carry
        )
        logits = pol.forward(a2c_params["policy"], cfg, features, buf)[:, -1, :]
        key = step_keys[p - 1]
        action = sample_categorical(key, logits)
        logp = log_prob_of(logits, action)
        token_in = jnp.where(p < curr_seq_len, captions[:, p], action)
        buf = jnp.concatenate([buf, token_in[:, None]], axis=1)
        reward_prefix = jnp.concatenate([buf[:, :-1], action[:, None]], axis=1)
        (ve, se), rew_carry = reward_mod.forward_compat(
            reward_params, cfg, features, reward_prefix, rew_carry
        )
        reward = jax.lax.stop_gradient(cosine_embedding_reward(ve, se))
        values_l.append(value[:, 0])
        rewards_l.append(reward)
        logps_l.append(logp)

    values = jnp.stack(values_l, axis=1)
    rewards = jnp.stack(rewards_l, axis=1)
    log_probs = jnp.stack(logps_l, axis=1)

    p_idx = jnp.arange(1, t_max)[None, :]
    mask = ((p_idx >= curr_seq_len) & (p_idx <= caplen - 1)).astype(values.dtype)
    mask = jnp.broadcast_to(mask, values.shape)
    actor, critic = a2c_losses(
        values, rewards, log_probs, step_mask=mask, per_step_mean=per_step_mean
    )
    loss = actor + critic
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    stats = RolloutStats(
        loss=loss, actor_loss=actor, critic_loss=critic,
        mean_reward=jnp.sum(rewards * mask) / denom,
        mean_advantage=jnp.sum((values - rewards) * mask) / denom,
    )
    return loss, stats


def a2c_rollout_loss_fused(
    a2c_params: dict,
    cfg: NetConfig,
    reward_params: dict,
    features: jax.Array,
    captions: jax.Array,
    curr_seq_len: jax.Array,
    caplen: jax.Array,
    rng: jax.Array,
    per_step_mean: bool = False,
    block_n: int = 128,
    weight_dtype=None,
    interpret: bool = False,
    fuse_reward: bool = True,
    tape_gates: bool = True,
) -> Tuple[jax.Array, RolloutStats]:
    """:func:`a2c_rollout_loss` with the policy+value rollout fused into
    Pallas TPU kernels (ops/pallas_rollout.py, hand-written VJP).

    Identical semantics: same Gumbel-max sampling keys (token parity
    with the XLA rollout under the interpreter), same loss/mask math.
    The frozen reward stream — stop-gradient by construction (Q7,
    trainers.py:372-373) — runs INSIDE the rollout kernel by default
    (``fuse_reward=True``, the round-3 A/B winner: one Pallas program
    instead of two); ``fuse_reward=False`` keeps it as the separate
    :func:`..ops.pallas_rollout.fused_reward_stream` program.
    ``tape_gates=False`` trades the gate-activation tape for a
    recompute in the backward kernels (see BENCHMARKS.md for the A/B).
    """
    from ..ops.pallas_rollout import fused_rollout

    if weight_dtype is None:
        weight_dtype = jnp.bfloat16
    n, t_max = captions.shape
    if fuse_reward:
        values, log_probs, actions, tokens, rewards = fused_rollout(
            a2c_params, cfg, features, captions, curr_seq_len, rng,
            block_n=block_n, weight_dtype=weight_dtype, interpret=interpret,
            reward_params=reward_params, tape_gates=tape_gates,
        )
    else:
        values, log_probs, actions, tokens = fused_rollout(
            a2c_params, cfg, features, captions, curr_seq_len, rng,
            block_n=block_n, weight_dtype=weight_dtype, interpret=interpret,
            tape_gates=tape_gates,
        )

        # frozen reward stream (lookahead on the sampled action, then the
        # placed token advances the carried GRU), fused like the rollout
        from ..ops.pallas_rollout import fused_reward_stream

        rewards = fused_reward_stream(
            reward_params, cfg, features, captions[:, 0], actions, tokens,
            block_n=block_n, weight_dtype=weight_dtype, interpret=interpret,
        )

    p_idx = jnp.arange(1, t_max)[None, :]
    mask = ((p_idx >= curr_seq_len) & (p_idx <= caplen - 1)).astype(values.dtype)
    mask = jnp.broadcast_to(mask, values.shape)
    actor, critic = a2c_losses(
        values, rewards, log_probs, step_mask=mask, per_step_mean=per_step_mean
    )
    loss = actor + critic
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    stats = RolloutStats(
        loss=loss, actor_loss=actor, critic_loss=critic,
        mean_reward=jnp.sum(rewards * mask) / denom,
        mean_advantage=jnp.sum((values - rewards) * mask) / denom,
    )
    return loss, stats


def make_a2c_step(
    cfg: NetConfig,
    tx: optax.GradientTransformation,
    per_step_mean: bool = False,
    compat: bool = False,
    donate: bool = False,
    fused: bool = False,
):
    """Builder for the jitted A2C update (plain or curriculum).

    Unidirectional models use the carried-state scan rollout;
    bidirectional models dispatch to the full-prefix variant; ``compat``
    selects the reference-exact batch-as-time rollout (quirk Q1).
    ``donate`` donates the params/opt-state buffers so Adam updates in
    place (training loops set it; keep it off when the caller reuses the
    input pytrees after the call). ``fused`` runs the rollout through
    the Pallas kernels with the hand-written VJP
    (:func:`a2c_rollout_loss_fused`; TPU only, unidirectional,
    non-compat).
    """
    if fused:
        if compat or cfg.bidirectional:
            raise ValueError("fused rollout is unidirectional, non-compat only")
        rollout = a2c_rollout_loss_fused
    elif compat:
        rollout = a2c_rollout_loss_compat
    else:
        rollout = a2c_rollout_loss_full if cfg.bidirectional else a2c_rollout_loss

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(a2c_params, opt_state, reward_params, features, captions, curr_seq_len, rng):
        caplen = jnp.max(batch_caption_lens(captions))
        (loss, stats), grads = jax.value_and_grad(rollout, has_aux=True)(
            a2c_params, cfg, reward_params, features, captions,
            curr_seq_len, caplen, rng, per_step_mean=per_step_mean,
        )
        updates, opt_state = tx.update(grads, opt_state, a2c_params)
        return optax.apply_updates(a2c_params, updates), opt_state, stats

    return step

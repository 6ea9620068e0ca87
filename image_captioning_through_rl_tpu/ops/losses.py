"""Loss functions.

Each reproduces the reference's exact numerics (including its quirks,
which are documented inline) but as fully vectorized XLA graphs — no
Python loops over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import matmul


def visual_semantic_embedding_loss(
    visuals: jax.Array,
    semantics: jax.Array,
    beta: float = 0.2,
    precision=None,
) -> jax.Array:
    """Bidirectional max-margin ranking loss over the batch similarity matrix.

    Mirrors the reference exactly (trainers.py:23-54), including its two
    idiosyncrasies: the margin is ``beta / N`` (not ``beta``), and the
    zeroed diagonal entries stay inside the relu-sum.

    ``visuals, semantics: [N, D]`` -> scalar.
    """
    n = visuals.shape[0]
    margin = beta / n
    off_diag = 1.0 - jnp.eye(n, dtype=visuals.dtype)

    def one_side(a, b):
        sim = matmul(a, b.T, precision=precision)  # [N, N]
        sim = sim - jnp.diagonal(sim)[:, None]
        sim = sim + margin * off_diag
        return jnp.sum(jax.nn.relu(sim)) / n

    return one_side(visuals, semantics) + one_side(semantics, visuals)


def weighted_caption_xe_loss(
    logits: jax.Array,
    targets: jax.Array,
    caption_lens: jax.Array,
) -> jax.Array:
    """Caption-length-weighted cross-entropy (policy pretraining loss).

    The reference computes, per sample, the mean token CE over the first
    ``caplen`` positions and weights it by ``caplen / N`` before summing
    (trainers.py:239-242). Algebraically the ``caplen`` factors cancel:

        sum_i (caplen_i / N) * mean_{t < caplen_i} ce_{i,t}
          = (1 / N) * sum_{i, t < caplen_i} ce_{i,t}

    so the loss is simply the masked token-CE sum divided by the batch
    size — one fused masked reduction instead of the reference's Python
    loop over the batch.

    Args:
      logits: ``[N, T, V]`` for inputs ``captions[:, :-1]``.
      targets: ``[N, T]`` — ``captions[:, 1:]``.
      caption_lens: ``[N]`` int — index of the END token + 1 in the
        *unshifted* caption (reference trainers.py:241).
    """
    n, t, _ = logits.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]  # [N, T]
    pos = jnp.arange(t)[None, :]
    mask = (pos < caption_lens[:, None]).astype(tok_ce.dtype)
    return jnp.sum(tok_ce * mask) / n


def a2c_losses(
    values: jax.Array,
    rewards: jax.Array,
    log_probs: jax.Array,
    step_mask: jax.Array | None = None,
    per_step_mean: bool = False,
):
    """Actor and critic losses of the A2C update.

    Reproduces the reference's advantage convention ``A = V - r``
    (trainers.py:471 — note the sign: the negative of the usual ``r - V``)
    and its lack of a stop-gradient on the advantage inside the actor
    term, so the actor loss also backpropagates into the value network,
    exactly as the reference's autograd graph does.

    Args:
      values, rewards, log_probs: ``[N, S]`` rollout stacks.
      step_mask: optional ``[N, S]`` 0/1 mask selecting valid rollout
        steps (used to emulate the reference's dynamic ``caplen`` under a
        fixed-shape scan).
      per_step_mean: curriculum variant first means over the step axis
        (reference trainers.py:581-584); the plain variant means over
        everything at once (trainers.py:472-473). With a constant number
        of valid steps the two agree; both paths are provided for exact
        parity.

    Returns:
      ``(actor_loss, critic_loss)`` scalars.
    """
    advantage = values - rewards
    actor_terms = -log_probs * advantage
    critic_terms = 0.5 * jnp.square(advantage)
    if step_mask is None:
        step_mask = jnp.ones_like(values)
    denom_all = jnp.maximum(jnp.sum(step_mask), 1.0)
    if per_step_mean:
        row = jnp.maximum(jnp.sum(step_mask, axis=1), 1.0)
        actor = jnp.mean(jnp.sum(actor_terms * step_mask, axis=1) / row)
        critic = jnp.mean(jnp.sum(critic_terms * step_mask, axis=1) / row)
    else:
        actor = jnp.sum(actor_terms * step_mask) / denom_all
        critic = jnp.sum(critic_terms * step_mask) / denom_all
    return actor, critic

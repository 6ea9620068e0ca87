"""Value-guided beam search ("lookahead inference" of the paper).

Reference algorithm (trainers.py:73-105): keep ``beamSize`` candidate
captions; per step, expand each candidate with the policy's top-k next
tokens, score each expansion with

    score_delta = 0.6 * V(features, candidate + token) + 0.4 * log p

accumulate ``score = parent_score - score_delta`` and keep the
``beamSize`` *smallest* scores (so the largest accumulated delta wins).

The reference implementation has two load-bearing quirks (SURVEY §2.6):

  Q2a — candidate scores are ``[N, 1]`` tensors ranked by their *mean
        over the whole minibatch* (trainers.py:100), so all images in a
        batch share a single beam-path selection;
  Q2b — ``log p`` is the log of the *raw top-k logit values* (not
        log-softmax), which is NaN for non-positive logits
        (trainers.py:93,97).

Both behaviors are reproduced under ``DecodeConfig(per_sample_beams=
False)`` — the faithful mode (NaN scores rank last, matching the
stable-sort behavior of the reference once NaNs dominate). The default
``per_sample_beams=True`` mode keeps an independent beam per image and
scores with log-softmax probabilities — the semantics the paper
describes.

TPU-native structure: all candidates across batch and beam advance as
one ``[N*B]`` batch per step; the policy and value encoders carry
per-candidate LSTM state (gathered on reorder) instead of re-encoding
every candidate from scratch, turning the reference's
~(B + B^2) full-prefix RNN passes per step into B^2 *single-cell*
steps — O(T) total instead of O(T^2).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import DecodeConfig, NetConfig
from ..models import policy as policy_mod
from ..models import value as value_mod


def _gather_beam(tree, idx: jax.Array):
    """Gather along the beam axis (axis=1) of every ``[N, B, ...]`` leaf."""
    def g(x):
        expand = (slice(None),) * 2 + (None,) * (x.ndim - 2)
        return jnp.take_along_axis(
            x, idx[expand].astype(jnp.int32), axis=1
        )
    return jax.tree.map(g, tree)


def beam_search(
    policy_params: dict,
    value_params: dict,
    cfg: NetConfig,
    dcfg: DecodeConfig,
    features: jax.Array,
    start_tokens: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Run value-guided beam search.

    Args:
      policy_params / value_params: actor and critic parameters
        (either direction mode — bidirectional policies/critics carry
        the forward state and recompute the single backward cell the
        last position needs, see models/policy.py; the critic uses the
        clean per-sample semantics).
      features: ``[N, F]`` image features.
      start_tokens: ``[N]`` <START> ids.

    Returns:
      ``(tokens [N, B, T], scores [N, B])`` with beam 0 the best-ranked
      candidate (the reference's ``most_likely=True`` result,
      trainers.py:103-104).
    """
    n = features.shape[0]
    b = dcfg.beam_size
    t_max = dcfg.max_seq_len

    def tile_beam(x):
        return jnp.broadcast_to(x[:, None], (n, b) + x.shape[1:])

    # --- initial candidate state: every beam holds [<START>] ---------------
    tokens = jnp.zeros((n, b, t_max), jnp.int32)
    tokens = tokens.at[:, :, 0].set(start_tokens[:, None])

    pol0 = policy_mod.init_decode_state(policy_params, cfg, features)
    logits0, pol1 = policy_mod.step(policy_params, cfg, start_tokens, pol0)
    pol_state = jax.tree.map(tile_beam, pol1)  # [N, B, H] x2
    last_logits = tile_beam(logits0)  # [N, B, V]

    val_state = value_mod.rnn_step(
        value_params, cfg, start_tokens, value_mod.zero_rnn_state(cfg, n)
    )
    val_state = jax.tree.map(tile_beam, val_state)  # [N, B, H] x2

    # Only beam 0 is a real candidate at step 0 (the reference starts from a
    # single candidate, trainers.py:88); +inf parents keep clones unselected.
    scores = jnp.where(jnp.arange(b)[None, :] == 0, 0.0, jnp.inf)
    scores = jnp.broadcast_to(scores, (n, b)).astype(features.dtype)

    feats_beam = tile_beam(features)  # [N, B, F]

    def step(carry, t):
        tokens, scores, pol_state, val_state, last_logits = carry

        # 1) top-k expansions per candidate (indices identical whether taken
        #    over raw logits or log-softmax — monotonic transform).
        topk_vals, topk_idx = jax.lax.top_k(last_logits, b)  # [N, B, B]
        if dcfg.per_sample_beams:
            logp_all = jax.nn.log_softmax(last_logits, axis=-1)
            logp = jnp.take_along_axis(logp_all, topk_idx, axis=-1)
        else:
            # Q2b: log of raw logit values, NaN for logits <= 0.
            logp = jnp.log(topk_vals)

        # 2) critic on every expanded candidate: advance the carried value
        #    encoder by one cell step with the expansion token.
        def tile_exp(x):  # [N, B, ...] -> [N, B, B, ...]
            return jnp.broadcast_to(x[:, :, None], (n, b, b) + x.shape[2:])

        emb = value_params["embedding"][topk_idx]  # [N, B, B, E]
        vstate_new = value_mod.rnn_step_emb(
            value_params, cfg, emb, jax.tree.map(tile_exp, val_state)
        )
        values = value_mod.value_from_state(
            value_params, cfg, tile_exp(feats_beam), vstate_new
        )[..., 0]  # [N, B, B]

        # 3) accumulate scores (reference trainers.py:97-98).
        delta = dcfg.value_weight * values + dcfg.logprob_weight * logp
        cand_scores = scores[:, :, None] - delta  # [N, B, B]
        flat_scores = cand_scores.reshape(n, b * b)

        # 4) select the B smallest.
        if dcfg.per_sample_beams:
            neg_top, sel = jax.lax.top_k(-flat_scores, b)  # per sample
            new_scores = -neg_top
        else:
            # Q2a: one shared ranking by batch-mean score; NaNs rank last.
            key = jnp.mean(flat_scores, axis=0)  # [B*B]
            sel = jnp.argsort(key)[:b]  # ascending, NaNs last
            sel = jnp.broadcast_to(sel[None, :], (n, b))
            new_scores = jnp.take_along_axis(flat_scores, sel, axis=1)

        parent = sel // b  # [N, B]
        expansion = sel % b

        # 5) reorder candidate state under the selection.
        new_tokens = _gather_beam(tokens, parent)
        new_tok = jnp.take_along_axis(
            jnp.take_along_axis(topk_idx, parent[:, :, None], axis=1),
            expansion[:, :, None],
            axis=2,
        )[:, :, 0]  # [N, B]
        new_tokens = jax.lax.dynamic_update_slice_in_dim(
            new_tokens, new_tok[:, :, None], t + 1, axis=2
        )

        def gather_exp(x):  # [N, B, B, ...] -> selected [N, B, ...]
            xf = x.reshape((n, b * b) + x.shape[3:])
            expand = (slice(None),) * 2 + (None,) * (xf.ndim - 2)
            return jnp.take_along_axis(xf, sel[expand], axis=1)

        new_val_state = jax.tree.map(gather_exp, vstate_new)

        # 6) advance the actor with the chosen token (carried state
        #    replaces the reference's full-prefix re-run, trainers.py:92).
        #    Skipped on the LAST iteration — those logits feed the next
        #    iteration's top-k and there is none, so the cond saves the
        #    final [N*B] cell + vocab-head matmuls (~1/(T-1) of the
        #    beam's policy compute).
        pol_parent = _gather_beam(pol_state, parent)

        def do_advance(_):
            flat_state = jax.tree.map(lambda x: x.reshape(n * b, -1), pol_parent)
            logits_new, pol_new = policy_mod.step(
                policy_params, cfg, new_tok.reshape(n * b), flat_state
            )
            return (
                jax.tree.map(lambda x: x.reshape(n, b, -1), pol_new),
                logits_new.reshape(n, b, -1),
            )

        def skip_advance(_):
            return pol_parent, _gather_beam(last_logits, parent)

        new_pol_state, new_last_logits = jax.lax.cond(
            t < t_max - 2, do_advance, skip_advance, None
        )

        return (new_tokens, new_scores, new_pol_state, new_val_state, new_last_logits), None

    carry = (tokens, scores, pol_state, val_state, last_logits)
    (tokens, scores, *_), _ = jax.lax.scan(
        step, carry, jnp.arange(t_max - 1)
    )
    return tokens, scores

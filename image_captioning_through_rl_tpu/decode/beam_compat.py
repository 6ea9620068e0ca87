"""Checkpoint-faithful value-guided beam search (quirks Q1 + Q2).

The reference's evaluation beam (trainers.py:73-105) scores every
expanded candidate with a value network whose LSTM encoder is
*stateful across calls* (quirk Q1): ``ValueNetworkRNN`` keeps a
persistent ``hidden_cell`` (reference models.py:122-135) that threads
through every value evaluation inside the beam — up to B^2 calls per
step, 16 steps per validation slice — and is only reset between slices
(trainers.py:661). Each call itself consumes the candidate caption
*column-major with batch size 1* (models.py:133, 168-169), so the
value of sample ``i`` depends on samples ``< i``, on sibling
candidates evaluated earlier in the same step, and on every earlier
step of the slice.

:func:`beam_search` reproduces Q2a (batch-mean shared beam ranking)
and Q2b (log of raw top-k logits) but evaluates candidates with clean
per-sample value encoders, so it cannot reproduce the reference's
caption dumps token-for-token from a converted checkpoint. This module
closes that gap: all value evaluations of a step are concatenated — in
the reference's exact (candidate-major, expansion-minor) call order —
into one flat token stream and scanned with an explicitly threaded
carry (ops.rnn.flat_stream_scan), giving numerics identical to the
eager reference loop.

Sequential by construction (the carried state serializes ~B^2 * N * T
LSTM cell steps per beam step); use it for checkpoint parity and
reference-exact dumps, not for throughput — the default per-sample
beam and the fused Pallas kernel are the fast paths.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DecodeConfig, NetConfig
from ..models import policy as policy_mod
from ..models import value as value_mod
from ..ops.rnn import LSTMState, flat_stream_scan


def beam_search_compat(
    policy_params: dict,
    value_params: dict,
    cfg: NetConfig,
    dcfg: DecodeConfig,
    features: jax.Array,
    start_tokens: jax.Array,
    carry: Optional[LSTMState] = None,
) -> Tuple[jax.Array, jax.Array, LSTMState]:
    """Reference-exact beam search with Q1 value statefulness.

    Args:
      features: ``[N, F]`` image features (one validation slice).
      start_tokens: ``[N]`` <START> ids.
      carry: the persistent value-encoder ``hidden_cell`` entering this
        slice (``(h, c)`` each ``[H]``). Defaults to zeros — the state a
        freshly constructed/loaded model holds (models.py:122-128); the
        reference resets it after every slice (trainers.py:661), so per
        slice evaluation passes a fresh default.

    Returns:
      ``(tokens [N, B, T], scores [N, B], carry_out)`` with beam 0 the
      reference's ``most_likely=True`` candidate.

    Bidirectional models thread one carry per direction through every
    call (the reference's persistent ``(2, 1, H)`` hidden) — each
    candidate evaluation is a :func:`..models.value.forward_compat`
    call chained by a ``lax.scan`` over the step's candidates.

    NaN scope of "token-exact": Q2b takes ``log`` of raw logits, so a
    negative top-k logit makes that candidate's score NaN. Here
    ``jnp.argsort`` deterministically ranks NaN scores LAST; the
    reference's Python ``sorted`` under NaN comparisons is
    insertion-order-dependent (genuinely ill-defined), so token
    exactness against the torch oracle is guaranteed only for prefixes
    where no NaN enters the top-B. Once NaNs dominate (all-negative
    logits), both implementations keep *some* B candidates — ours the
    deterministic first-B — and the claim weakens to "a valid beam",
    tested in tests/test_decode.py (NaN-ranking test).
    """
    n = features.shape[0]
    b = dcfg.beam_size
    t_max = dcfg.max_seq_len
    hid = cfg.hidden_dim
    if carry is None:
        carry = value_mod.compat_zero_state(cfg, dtype=features.dtype)

    # The reference starts from ONE candidate (trainers.py:88), so only
    # B value calls happen at step 0 (B^2 afterwards) — the candidate
    # count must grow 1 -> B for the carried stream to stay faithful.
    tokens = jnp.broadcast_to(start_tokens[:, None, None], (n, 1, 1)).astype(jnp.int32)
    scores = jnp.zeros((n, 1), features.dtype)

    for t in range(t_max - 1):
        c = tokens.shape[1]  # candidates this step: 1 at t=0, B after
        # policy over each candidate's full prefix (trainers.py:92);
        # the policy is stateless so batching all candidates is exact.
        flat = tokens.reshape(n * c, t + 1)
        feats_rep = jnp.repeat(features, c, axis=0)
        logits = policy_mod.forward(policy_params, cfg, feats_rep, flat)[:, -1, :]
        logits = logits.reshape(n, c, -1)
        topv, topi = jax.lax.top_k(logits, b)  # [N, C, B]
        logp = jnp.log(topv)  # Q2b: log of raw logit values

        ext = jnp.concatenate(
            [
                jnp.broadcast_to(tokens[:, :, None], (n, c, b, t + 1)),
                topi[..., None],
            ],
            axis=-1,
        )  # [N, C, B, t+2]

        if cfg.bidirectional:
            # per-direction carries cannot concatenate into one stream
            # (the backward direction reverses within each call): chain
            # the C*B forward_compat calls with a scan in call order
            caps_calls = ext.transpose(1, 2, 0, 3).reshape(c * b, n, t + 2)

            def one_call(cry, cap):
                v, cry = value_mod.forward_compat(
                    value_params, cfg, features, cap, cry
                )
                return cry, v[:, 0]

            carry, values = jax.lax.scan(one_call, carry, caps_calls)
            values = values.reshape(c, b, n).transpose(2, 0, 1)  # [N, C, B]
        else:
            # All C*B value calls of this step as ONE carried stream, in
            # the reference's call order: candidate-major, expansion-
            # minor, each call column-major (models.py:133, 168-169).
            stream = ext.transpose(1, 2, 3, 0).reshape(-1)  # [C*B*(t+2)*N]
            xs = value_params["embedding"][stream]
            outs, carry = flat_stream_scan(
                "lstm", value_params["lstm"], xs, carry, precision=cfg.precision
            )
            rnn_out = outs.reshape(c, b, t + 2, n, hid)[:, :, -1]  # final column
            values = value_mod.value_head(
                value_params, cfg,
                jnp.broadcast_to(features, (c, b) + features.shape), rnn_out,
            )[..., 0]  # [C, B, N]
            values = values.transpose(2, 0, 1)  # [N, C, B]

        delta = dcfg.value_weight * values + dcfg.logprob_weight * logp
        cand_scores = (scores[:, :, None] - delta).reshape(n, c * b)

        # Q2a: one shared ranking by batch-mean score (NaNs rank last,
        # matching the reference once NaN scores dominate — see .beam).
        key = jnp.mean(cand_scores, axis=0)
        sel = jnp.argsort(key, stable=True)[:b]
        sel = jnp.broadcast_to(sel[None, :], (n, b))
        scores = jnp.take_along_axis(cand_scores, sel, axis=1)
        tokens = jnp.take_along_axis(
            ext.reshape(n, c * b, t + 2), sel[:, :, None], axis=1
        )

    return tokens, scores, carry

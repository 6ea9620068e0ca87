"""Value-guided beam search via full-prefix re-encoding.

The reference-literal loop (trainers.py:89-101): re-encode every
candidate's whole prefix each step, unrolled in Python so each prefix
length is a static shape inside one jitted graph. The carried-state
beam in :mod:`.beam` now matches it for BOTH direction modes — a
bidirectional policy/critic (reference ``--bidirectional``,
models.py:68) reads only the last position per step, whose backward
hidden is one cell from the fixed backward initial state
(models/policy.py) — so this variant's remaining role is the
reference-exact oracle for parity tests; it costs ~T times more
recurrent work than the carried-state beam.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import DecodeConfig, NetConfig
from ..models import policy as policy_mod
from ..models import value as value_mod


def beam_search_full_prefix(
    policy_params: dict,
    value_params: dict,
    cfg: NetConfig,
    dcfg: DecodeConfig,
    features: jax.Array,
    start_tokens: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(tokens [N, B, T], scores [N, B])``, beam 0 best."""
    n = features.shape[0]
    b = dcfg.beam_size
    t_max = dcfg.max_seq_len

    tokens = jnp.broadcast_to(start_tokens[:, None, None], (n, b, 1)).astype(jnp.int32)
    scores = jnp.where(jnp.arange(b)[None, :] == 0, 0.0, jnp.inf)
    scores = jnp.broadcast_to(scores, (n, b)).astype(features.dtype)

    feats_rep = jnp.repeat(features, b, axis=0)  # [N*B, F]
    feats_bb = jnp.repeat(features, b * b, axis=0)  # [N*B*B, F], hoisted
    # out of the unrolled loop like feats_rep (16 identical repeats
    # otherwise land in the jaxpr)

    for t in range(t_max - 1):
        # policy on every candidate's full prefix -> last-step logits
        flat_toks = tokens.reshape(n * b, t + 1)
        logits = policy_mod.forward(policy_params, cfg, feats_rep, flat_toks)[:, -1, :]
        logits = logits.reshape(n, b, -1)

        topk_vals, topk_idx = jax.lax.top_k(logits, b)  # [N, B, B]
        if dcfg.per_sample_beams:
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), topk_idx, axis=-1
            )
        else:
            logp = jnp.log(topk_vals)  # Q2b

        # value of every expanded candidate (full re-encode)
        ext = jnp.concatenate(
            [
                jnp.broadcast_to(tokens[:, :, None], (n, b, b, t + 1)),
                topk_idx[..., None],
            ],
            axis=-1,
        )  # [N, B, B, t+2]
        flat_ext = ext.reshape(n * b * b, t + 2)
        values = value_mod.forward(
            value_params, cfg, feats_bb, flat_ext
        ).reshape(n, b, b)

        delta = dcfg.value_weight * values + dcfg.logprob_weight * logp
        cand_scores = (scores[:, :, None] - delta).reshape(n, b * b)

        if dcfg.per_sample_beams:
            neg_top, sel = jax.lax.top_k(-cand_scores, b)
            scores = -neg_top
        else:
            key = jnp.mean(cand_scores, axis=0)
            sel = jnp.broadcast_to(jnp.argsort(key)[None, :b], (n, b))
            scores = jnp.take_along_axis(cand_scores, sel, axis=1)

        tokens = jnp.take_along_axis(
            ext.reshape(n, b * b, t + 2), sel[:, :, None], axis=1
        )

    return tokens, scores

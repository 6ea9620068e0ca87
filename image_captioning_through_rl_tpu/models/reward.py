"""Reward network: visual-semantic embedding model (the learned reward).

Architecture per the reference's ``RewardNetwork``/``RewardNetworkRNN``
(models.py:183-262): token embedding -> GRU caption encoder ->
``semantic_embed`` projection; image feature -> ``visual_embed``
projection. The forward returns the raw ``(ve, se)`` pair; cosine reward
and the VSE ranking loss are separate ops
(:func:`..ops.reward_ops.cosine_embedding_reward`,
:func:`..ops.losses.visual_semantic_embedding_loss`).

Encoding modes mirror :mod:`.value`: batched per-sample recurrence by
default, plus an exact batch-as-time compat path (quirk Q1,
models.py:217-226) and incremental stepping for on-chip rollouts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import NetConfig
from ..ops.linalg import dense
from ..ops.rnn import column_stream_scan_bidi, flat_stream_scan, gru_cell, gru_scan
from .initializers import embedding_init, gru_init, linear_init


def init(rng: jax.Array, cfg: NetConfig, pretrained_embeddings=None) -> dict:
    ks = jax.random.split(rng, 5)
    h = cfg.hidden_dim
    rnn_out_dim = h * cfg.num_directions
    if pretrained_embeddings is not None:
        embedding = jnp.asarray(pretrained_embeddings, dtype=jnp.float32)
        wordvec_dim = embedding.shape[1]
    else:
        embedding = embedding_init(ks[0], cfg.vocab_size, cfg.wordvec_dim)
        wordvec_dim = cfg.wordvec_dim
    params = {
        "embedding": embedding,
        "visual_embed": linear_init(ks[1], cfg.input_dim, h),
        "semantic_embed": linear_init(ks[2], rnn_out_dim, h),
    }
    if cfg.bidirectional:
        params["gru_fwd"] = gru_init(ks[3], wordvec_dim, h)
        params["gru_bwd"] = gru_init(ks[4], wordvec_dim, h)
    else:
        params["gru"] = gru_init(ks[3], wordvec_dim, h)
    return params


def encode(params: dict, cfg: NetConfig, captions: jax.Array) -> jax.Array:
    """Per-sample caption encoding (batched mode). ``[N, T] -> [N, H*nd]``."""
    xs = jnp.swapaxes(params["embedding"][captions], 0, 1)  # [T, N, E]
    n = captions.shape[0]
    zeros = jnp.zeros((n, cfg.hidden_dim), dtype=xs.dtype)
    if cfg.bidirectional:
        hs_f, _ = gru_scan(params["gru_fwd"], xs, zeros, precision=cfg.precision)
        hs_b, _ = gru_scan(params["gru_bwd"], xs, zeros, precision=cfg.precision, reverse=True)
        # [fwd after all T tokens, bwd after only token T-1] — torch's
        # output[-1] convention, mirroring the reference's
        # keep-the-last-output loop per sample (models.py:254-255); see
        # the matching note in models/value.py.
        return jnp.concatenate([hs_f[-1], hs_b[-1]], axis=-1)
    hs, _ = gru_scan(params["gru"], xs, zeros, precision=cfg.precision)
    return hs[-1]


def embed_pair(
    params: dict, cfg: NetConfig, features: jax.Array, rnn_out: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    ve = dense(features, params["visual_embed"], precision=cfg.precision)
    se = dense(rnn_out, params["semantic_embed"], precision=cfg.precision)
    return ve, se


def forward(
    params: dict, cfg: NetConfig, features: jax.Array, captions: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Batched-mode forward -> ``(ve [N, H], se [N, H])``."""
    return embed_pair(params, cfg, features, encode(params, cfg, captions))


def get_rewards(
    params: dict, cfg: NetConfig, features: jax.Array, captions: jax.Array
) -> jax.Array:
    """Embedding reward of (image, caption) pairs -> ``[N, 1]``.

    Convenience mirroring the reference's ``GetRewards``
    (trainers.py:108-121): forward + L2-normalized cosine similarity.
    """
    from ..ops.reward_ops import cosine_embedding_reward

    ve, se = forward(params, cfg, features, captions)
    return cosine_embedding_reward(ve, se)[:, None]


# --- incremental stepping (unidirectional) ---------------------------------

def zero_rnn_state(cfg: NetConfig, batch: int, dtype=jnp.float32) -> jax.Array:
    return jnp.zeros((batch, cfg.hidden_dim), dtype=dtype)


def rnn_step(params: dict, cfg: NetConfig, tokens: jax.Array, h: jax.Array) -> jax.Array:
    if cfg.bidirectional:
        raise ValueError("incremental reward encoding requires unidirectional mode")
    x = params["embedding"][tokens]
    return gru_cell(params["gru"], x, h, precision=cfg.precision)


# --- reference-compat batch-as-time mode (quirk Q1) -------------------------

def compat_zero_state(cfg: NetConfig, dtype=jnp.float32):
    """Persistent hidden equivalent; bidirectional carries one ``[H]``
    state per direction (the reference's ``(2, 1, H)``, models.py:217-224)."""
    z = jnp.zeros((cfg.hidden_dim,), dtype=dtype)
    if cfg.bidirectional:
        return (z, z)
    return z


def forward_compat(
    params: dict,
    cfg: NetConfig,
    features: jax.Array,
    captions: jax.Array,
    carry,
) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
    """Reference-exact forward with batch-as-time GRU statefulness.

    Returns ``((ve, se), new_carry)``; reset the carry per minibatch
    where the reference calls ``init_hidden()`` (trainers.py:307, 495).
    Bidirectional mode threads a per-direction carry pair through every
    column and call (see :func:`..ops.rnn.column_stream_scan_bidi`).
    """
    n, t = captions.shape
    if cfg.bidirectional:
        xs_tne = jnp.swapaxes(params["embedding"][captions], 0, 1)  # [T, N, E]
        rnn_out, new_carry = column_stream_scan_bidi(
            "gru", params["gru_fwd"], params["gru_bwd"], xs_tne, carry,
            precision=cfg.precision,
        )
        return embed_pair(params, cfg, features, rnn_out), new_carry
    stream = jnp.reshape(jnp.swapaxes(captions, 0, 1), (-1,))
    xs = params["embedding"][stream]
    outs, new_carry = flat_stream_scan(
        "gru", params["gru"], xs, carry, precision=cfg.precision
    )
    rnn_out = outs[(t - 1) * n :]
    return embed_pair(params, cfg, features, rnn_out), new_carry

"""Policy network (actor): feature-conditioned LSTM caption decoder.

Same architecture as the reference's ``PolicyNetwork`` (models.py:33-84):
token embedding -> LSTM whose initial hidden state is a linear projection
of the VGG16 fc7 image feature (cell state zeros) -> linear vocab head.
Bidirectional mode splits the projected feature into per-direction
initial states and concatenates direction outputs before the head
(models.py:76-77).

Two forward paths:

  * :func:`forward` — full-sequence teacher forcing, one big scan. Used
    for XE pretraining and for parity with the reference's
    re-run-the-whole-prefix decoding.
  * :func:`init_decode_state` + :func:`step` — incremental single-token
    stepping that carries ``(h, c)``, making autoregressive decode O(T)
    instead of the reference's O(T^2) (quirk Q6, trainers.py:67-69).
    For a unidirectional LSTM the carried recurrence is exactly
    equivalent to re-encoding the prefix. Bidirectional decode
    (models.py:76-77) is ALSO O(T)-steppable, which is not obvious:
    decoding reads only the LAST position's logits, and the backward
    direction's hidden AT the last position of any prefix is the FIRST
    step of its right-to-left scan — a single cell applied to the
    current token from the (fixed) initial backward state, independent
    of the rest of the prefix. The bidi step therefore carries the
    forward ``(h, c)`` as usual and recomputes that one backward cell
    per token, producing logits identical to the full-prefix re-encode
    (the ``*_full_prefix`` decode family stays as the reference-literal
    oracle; equality is pinned by tests/test_bidirectional.py).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from ..config import NetConfig
from ..ops.linalg import dense
from ..ops.rnn import LSTMState, bilstm_scan, lstm_cell, lstm_scan
from .initializers import embedding_init, linear_init, lstm_init


def init(rng: jax.Array, cfg: NetConfig, pretrained_embeddings=None) -> dict:
    ks = jax.random.split(rng, 5)
    h, nd = cfg.hidden_dim, cfg.num_directions
    if pretrained_embeddings is not None:
        embedding = jnp.asarray(pretrained_embeddings, dtype=jnp.float32)
        wordvec_dim = embedding.shape[1]
    else:
        embedding = embedding_init(ks[0], cfg.vocab_size, cfg.wordvec_dim)
        wordvec_dim = cfg.wordvec_dim
    params = {
        "embedding": embedding,
        "cnn2linear": linear_init(ks[1], cfg.input_dim, h * nd),
        "head": linear_init(ks[2], h * nd, cfg.vocab_size),
    }
    if cfg.bidirectional:
        params["lstm_fwd"] = lstm_init(ks[3], wordvec_dim, h)
        params["lstm_bwd"] = lstm_init(ks[4], wordvec_dim, h)
    else:
        params["lstm"] = lstm_init(ks[3], wordvec_dim, h)
    return params


def _initial_states(params: dict, cfg: NetConfig, features: jax.Array):
    """Project image features to per-direction initial hidden states."""
    h0 = dense(features, params["cnn2linear"], precision=cfg.precision)  # [N, H*nd]
    if cfg.bidirectional:
        hf, hb = jnp.split(h0, 2, axis=-1)
        return (hf, jnp.zeros_like(hf)), (hb, jnp.zeros_like(hb))
    return h0, jnp.zeros_like(h0)


def forward(params: dict, cfg: NetConfig, features: jax.Array, captions: jax.Array) -> jax.Array:
    """Teacher-forced forward. ``features [N, F]``, ``captions [N, T]`` -> ``[N, T, V]``."""
    xs = params["embedding"][captions]  # [N, T, E]
    xs = jnp.swapaxes(xs, 0, 1)  # time-major [T, N, E]
    if cfg.bidirectional:
        init_f, init_b = _initial_states(params, cfg, features)
        hs, _ = bilstm_scan(
            params["lstm_fwd"], params["lstm_bwd"], xs, init_f, init_b,
            precision=cfg.precision,
        )
    else:
        state = _initial_states(params, cfg, features)
        hs, _ = lstm_scan(params["lstm"], xs, state, precision=cfg.precision)
    logits = dense(hs, params["head"], precision=cfg.precision)  # [T, N, V]
    return jnp.swapaxes(logits, 0, 1)


# Carried decode state: the forward ``(h, c)`` LSTMState when
# unidirectional, ``(fwd LSTMState, bwd_init LSTMState)`` when
# bidirectional (the nested pair is a pytree like any other).
DecodeState = Union[LSTMState, Tuple[LSTMState, LSTMState]]


def init_decode_state(params: dict, cfg: NetConfig, features: jax.Array
                      ) -> DecodeState:
    """Initial carried state for incremental decode.

    Unidirectional: the forward ``(h, c)``. Bidirectional:
    ``(fwd (h, c), bwd_init (h, c))`` — the backward initial state rides
    along unchanged because each step's backward contribution is one
    cell from it (see module docstring)."""
    return _initial_states(params, cfg, features)


def step(
    params: dict, cfg: NetConfig, tokens: jax.Array, state: DecodeState
) -> Tuple[jax.Array, DecodeState]:
    """Consume one token per sample; return next-token logits and new state.

    ``tokens: [N]`` int ids -> ``(logits [N, V], state)``. Exact for
    both directions: bidirectional mode advances the carried forward
    ``(h, c)`` and applies ONE backward cell to the current token from
    the carried (constant) backward initial state — the backward scan's
    value at the prefix's last position, which is all decode reads.
    """
    x = params["embedding"][tokens]  # [N, E]
    if cfg.bidirectional:
        fwd, bwd_init = state
        new_fwd = lstm_cell(params["lstm_fwd"], x, fwd, precision=cfg.precision)
        h_bwd, _ = lstm_cell(params["lstm_bwd"], x, bwd_init,
                             precision=cfg.precision)
        logits = dense(jnp.concatenate([new_fwd[0], h_bwd], axis=-1),
                       params["head"], precision=cfg.precision)
        return logits, (new_fwd, bwd_init)
    new_state = lstm_cell(params["lstm"], x, state, precision=cfg.precision)
    logits = dense(new_state[0], params["head"], precision=cfg.precision)
    return logits, new_state

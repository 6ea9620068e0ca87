"""Value network (critic): caption encoder + joint-state MLP.

Architecture per the reference's ``ValueNetwork``/``ValueNetworkRNN``
(models.py:87-180): token embedding -> LSTM caption encoder -> concat
with the image feature -> Linear(1024, 512) -> Linear(512, 1) with no
intervening nonlinearity (models.py:177-178). Bidirectional mode first
maps the 2H encoder output through ``rnn_linear`` (models.py:163-171).

Encoding semantics — two modes:

  * **batched** (default): conventional per-sample recurrence over the
    caption tokens; the whole batch advances in parallel, each step is
    one MXU matmul. This is the TPU-native semantics.
  * **compat** (quirk Q1): the reference feeds the batch axis as the
    LSTM *time* axis with batch size 1 and a persistent hidden state
    (models.py:122-135, 168-169), so sample ``i`` depends on samples
    ``< i`` and on earlier calls. :func:`forward_compat` reproduces this
    exactly by scanning the caption matrix column-major as one flat
    token stream with an explicitly threaded carry. Sequential by
    construction — used for checkpoint-parity testing only.

Incremental stepping (:func:`rnn_step` / :func:`value_from_state`) lets
rollouts and beam search carry encoder state instead of re-encoding the
whole prefix per step, removing the reference's O(T^2) work
(trainers.py:96, models.py:168-169).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import NetConfig
from ..ops.linalg import dense
from ..ops.rnn import (
    LSTMState,
    bilstm_scan,
    column_stream_scan_bidi,
    flat_stream_scan,
    lstm_cell,
    lstm_scan,
)
from .initializers import embedding_init, linear_init, lstm_init


def init(rng: jax.Array, cfg: NetConfig, pretrained_embeddings=None) -> dict:
    ks = jax.random.split(rng, 6)
    h = cfg.hidden_dim
    if pretrained_embeddings is not None:
        embedding = jnp.asarray(pretrained_embeddings, dtype=jnp.float32)
        wordvec_dim = embedding.shape[1]
    else:
        embedding = embedding_init(ks[0], cfg.vocab_size, cfg.wordvec_dim)
        wordvec_dim = cfg.wordvec_dim
    params = {
        "embedding": embedding,
        "linear1": linear_init(ks[1], cfg.input_dim + h, h),
        "linear2": linear_init(ks[2], h, 1),
    }
    if cfg.bidirectional:
        params["lstm_fwd"] = lstm_init(ks[3], wordvec_dim, h)
        params["lstm_bwd"] = lstm_init(ks[4], wordvec_dim, h)
        params["rnn_linear"] = linear_init(ks[5], 2 * h, h)
    else:
        params["lstm"] = lstm_init(ks[3], wordvec_dim, h)
    return params


def encode(params: dict, cfg: NetConfig, captions: jax.Array) -> jax.Array:
    """Per-sample caption encoding (batched mode). ``[N, T] -> [N, H]``."""
    xs = jnp.swapaxes(params["embedding"][captions], 0, 1)  # [T, N, E]
    n = captions.shape[0]
    h = cfg.hidden_dim
    zeros = jnp.zeros((n, h), dtype=xs.dtype)
    if cfg.bidirectional:
        hs, _ = bilstm_scan(
            params["lstm_fwd"], params["lstm_bwd"], xs,
            (zeros, zeros), (zeros, zeros), precision=cfg.precision,
        )
        # hs[-1] = [fwd after all T tokens, bwd after only token T-1] —
        # torch's output[-1] convention, the per-sample reinterpretation
        # of the reference's keep-the-last-output loop (models.py:168-169).
        # A conventional summary would use the backward FINAL state
        # instead; kept as-is deliberately for reference alignment.
        return dense(hs[-1], params["rnn_linear"], precision=cfg.precision)
    hs, _ = lstm_scan(params["lstm"], xs, (zeros, zeros), precision=cfg.precision)
    return hs[-1]


def value_head(params: dict, cfg: NetConfig, features: jax.Array, rnn_out: jax.Array) -> jax.Array:
    """MLP over the concatenated (image, caption) state. -> ``[N, 1]``."""
    state = jnp.concatenate([features, rnn_out], axis=-1)
    out = dense(state, params["linear1"], precision=cfg.precision)
    return dense(out, params["linear2"], precision=cfg.precision)


def forward(params: dict, cfg: NetConfig, features: jax.Array, captions: jax.Array) -> jax.Array:
    """Batched-mode value. ``features [N, F]``, ``captions [N, T]`` -> ``[N, 1]``."""
    return value_head(params, cfg, features, encode(params, cfg, captions))


# --- incremental stepping --------------------------------------------------
#
# Unidirectional state: the forward ``(h, c)``. Bidirectional state:
# ``(fwd (h, c), h_bwd_last)`` — :func:`encode` reads ``hs[-1]``, whose
# backward half is the reverse scan's value AT the last position, i.e.
# ONE backward cell applied to the last token from the zero initial
# state (independent of the rest of the prefix). So incremental value
# encoding is exact for bidirectional critics too: advance the forward
# ``(h, c)``, recompute that single backward cell per token.

def zero_rnn_state(cfg: NetConfig, batch: int, dtype=jnp.float32):
    z = jnp.zeros((batch, cfg.hidden_dim), dtype=dtype)
    if cfg.bidirectional:
        return ((z, z), z)
    return (z, z)


def rnn_step_emb(params: dict, cfg: NetConfig, x: jax.Array, state):
    """Advance the caption encoder by one already-embedded token
    ``x [..., E]`` per row (any leading shape — the beam expands
    candidates as ``[N, B, B, E]``)."""
    if cfg.bidirectional:
        fwd, _ = state
        new_fwd = lstm_cell(params["lstm_fwd"], x, fwd, precision=cfg.precision)
        z = jnp.zeros(x.shape[:-1] + (cfg.hidden_dim,), x.dtype)
        h_bwd, _ = lstm_cell(params["lstm_bwd"], x, (z, z),
                             precision=cfg.precision)
        return (new_fwd, h_bwd)
    return lstm_cell(params["lstm"], x, state, precision=cfg.precision)


def rnn_step(params: dict, cfg: NetConfig, tokens: jax.Array, state):
    """Advance the caption encoder by one token id per sample."""
    return rnn_step_emb(params, cfg, params["embedding"][tokens], state)


def value_from_state(params: dict, cfg: NetConfig, features: jax.Array, state) -> jax.Array:
    """Value of the prefix whose encoding is carried in ``state``. -> ``[N, 1]``."""
    if cfg.bidirectional:
        (h_f, _), h_bwd = state
        rnn_out = dense(jnp.concatenate([h_f, h_bwd], axis=-1),
                        params["rnn_linear"], precision=cfg.precision)
        return value_head(params, cfg, features, rnn_out)
    return value_head(params, cfg, features, state[0])


# --- reference-compat batch-as-time mode (quirk Q1) -------------------------

def compat_zero_state(cfg: NetConfig, dtype=jnp.float32):
    """The persistent ``hidden_cell`` equivalent (reference models.py:122-128).

    Unidirectional: ``(h, c)`` each ``[H]``. Bidirectional: a
    ``(fwd (h, c), bwd (h, c))`` pair — the reference's ``(2, 1, H)``
    hidden with the direction axis made explicit.
    """
    z = jnp.zeros((cfg.hidden_dim,), dtype=dtype)
    if cfg.bidirectional:
        return ((z, z), (z, z))
    return (z, z)


def forward_compat(
    params: dict,
    cfg: NetConfig,
    features: jax.Array,
    captions: jax.Array,
    carry,
) -> Tuple[jax.Array, LSTMState]:
    """Reference-exact value forward with batch-as-time statefulness.

    Returns ``(values [N, 1], new_carry)``; thread ``new_carry`` into the
    next call and reset it per minibatch exactly where the reference
    calls ``init_hidden()`` (trainers.py:196-197, 495-496, 611-612).
    Bidirectional mode threads one carry per direction — the backward
    direction enters each column (and each call) at sample N-1, exactly
    like a persistent-hidden ``nn.LSTM(bidirectional=True)``
    (models.py:120-135).
    """
    n, t = captions.shape
    if cfg.bidirectional:
        xs_tne = jnp.swapaxes(params["embedding"][captions], 0, 1)  # [T, N, E]
        rnn_out, new_carry = column_stream_scan_bidi(
            "lstm", params["lstm_fwd"], params["lstm_bwd"], xs_tne, carry,
            precision=cfg.precision,
        )
        rnn_out = dense(rnn_out, params["rnn_linear"], precision=cfg.precision)
        return value_head(params, cfg, features, rnn_out), new_carry
    stream = jnp.reshape(jnp.swapaxes(captions, 0, 1), (-1,))  # column-major [N*T]
    xs = params["embedding"][stream]
    outs, new_carry = flat_stream_scan(
        "lstm", params["lstm"], xs, carry, precision=cfg.precision
    )
    rnn_out = outs[(t - 1) * n :]  # outputs of the final column, [N, H]
    return value_head(params, cfg, features, rnn_out), new_carry

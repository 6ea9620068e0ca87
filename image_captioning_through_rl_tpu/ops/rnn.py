"""Recurrent cells and scan drivers.

The cells use the same gate math and parameter semantics as cuDNN-style
LSTM/GRU stacks (the reference's ``nn.LSTM``/``nn.GRU``,
models.py:68,120,215), but the parameters are stored input-major
(``[in, 4H]`` / ``[in, 3H]``) so each step is two MXU matmuls with the
elementwise gate math fused by XLA behind them.

Parameter pytrees:

  LSTM cell: ``{"wi": [E, 4H], "wh": [H, 4H], "b": [4H]}``
      gate order along the 4H axis: input, forget, cell(g), output —
      identical to torch so ``.pt`` checkpoints convert by transposition.
  GRU cell:  ``{"wi": [E, 3H], "wh": [H, 3H], "bi": [3H], "bh": [3H]}``
      gate order: reset, update, new. GRU keeps the two bias vectors
      separate because the candidate gate applies ``r`` *between* them.

Scans run over a time-major ``[T, N, E]`` layout; batch stays the
minor-most compute axis so every step is a ``[N, E] @ [E, 4H]`` matmul.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .linalg import matmul

LSTMState = Tuple[jax.Array, jax.Array]  # (h, c), each [N, H] (or [H])


def lstm_cell(params: dict, x: jax.Array, state: LSTMState, precision=None) -> LSTMState:
    """One LSTM step. ``x: [..., E]``, ``state: ([..., H], [..., H])``.

    The input and recurrent projections run as ONE ``[x; h] @ [wi; wh]``
    matmul: identical math, half the MXU dispatches per cell step (the
    concatenated weight is loop-invariant, so XLA hoists it out of
    scans) — measured ~7% off the full A2C step on v5e. (A GRU cannot
    fuse this way: its candidate gate needs the recurrent term
    separately for the reset product.)
    """
    h, c = state
    xh = jnp.concatenate([x, h], axis=-1)
    w = jnp.concatenate([params["wi"], params["wh"]], axis=0)
    gates = matmul(xh, w, precision=precision) + params["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def gru_cell(params: dict, x: jax.Array, h: jax.Array, precision=None) -> jax.Array:
    """One GRU step. ``x: [..., E]``, ``h: [..., H]`` -> new ``h``."""
    gi = matmul(x, params["wi"], precision=precision) + params["bi"]
    gh = matmul(h, params["wh"], precision=precision) + params["bh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def lstm_scan(
    params: dict,
    xs: jax.Array,
    init: LSTMState,
    precision=None,
    reverse: bool = False,
) -> Tuple[jax.Array, LSTMState]:
    """Run an LSTM over time-major inputs ``xs: [T, N, E]``.

    Returns ``(hs: [T, N, H], final_state)``.
    """

    def step(state, x):
        new = lstm_cell(params, x, state, precision=precision)
        return new, new[0]

    final, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return hs, final


def gru_scan(
    params: dict,
    xs: jax.Array,
    init: jax.Array,
    precision=None,
    reverse: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run a GRU over time-major inputs ``xs: [T, N, E]``."""

    def step(h, x):
        new = gru_cell(params, x, h, precision=precision)
        return new, new

    final, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return hs, final


def bilstm_scan(
    fwd_params: dict,
    bwd_params: dict,
    xs: jax.Array,
    fwd_init: LSTMState,
    bwd_init: LSTMState,
    precision=None,
) -> Tuple[jax.Array, Tuple[LSTMState, LSTMState]]:
    """Bidirectional LSTM: concat of a forward and a time-reversed scan.

    Output layout matches cuDNN bidirectional stacks: per timestep the
    last axis is ``[forward_h_t, backward_h_t]`` where ``backward_h_t``
    comes from the scan that consumed the sequence right-to-left.
    """
    hs_f, final_f = lstm_scan(fwd_params, xs, fwd_init, precision=precision)
    hs_b, final_b = lstm_scan(bwd_params, xs, bwd_init, precision=precision, reverse=True)
    return jnp.concatenate([hs_f, hs_b], axis=-1), (final_f, final_b)


def flat_stream_scan(
    cell_kind: str,
    params: dict,
    tokens_te: jax.Array,
    init_state,
    precision=None,
):
    """Compatibility scan reproducing the reference's "batch-as-time" RNNs.

    The reference feeds a batch of N token ids into its value/reward RNNs
    as a *length-N sequence with batch size 1*, keeps the hidden state
    alive across the outer per-column loop (reference models.py:133,
    168-169, 226, 254-255), and returns the outputs of the final column.
    Net effect: the RNN consumes the caption matrix column-major as one
    flat stream of ``N*T`` tokens, and sample ``i``'s representation is
    the hidden state after ``(T-1)*N + i + 1`` tokens.

    Args:
      cell_kind: ``"lstm"`` or ``"gru"``.
      params: cell parameter pytree.
      tokens_te: embedded token stream ``[N*T, E]`` in column-major
        (time-major) order, i.e. ``embed(captions).transpose(1,0,2)``
        flattened over the first two axes.
      init_state: carried state — ``(h, c)`` with shape ``[H]`` for LSTM,
        ``h: [H]`` for GRU. This is the persistent ``hidden_cell`` of the
        reference; thread it across calls and reset per minibatch to
        reproduce reference numerics exactly.

    Returns:
      ``(outputs: [N*T, H], final_state)`` — callers slice the last N
      rows to obtain the per-sample representations.
    """
    if cell_kind == "lstm":

        def step(state, x):
            new = lstm_cell(params, x, state, precision=precision)
            return new, new[0]

    elif cell_kind == "gru":

        def step(h, x):
            new = gru_cell(params, x, h, precision=precision)
            return new, new

    else:  # pragma: no cover - defensive
        raise ValueError(f"unknown cell kind: {cell_kind!r}")

    final, outs = jax.lax.scan(step, init_state, tokens_te)
    return outs, final


def column_stream_scan_bidi(
    cell_kind: str,
    fwd_params: dict,
    bwd_params: dict,
    xs_tne: jax.Array,
    carry,
    precision=None,
):
    """Bidirectional batch-as-time compat scan (quirk Q1, bidirectional).

    The reference's bidirectional value/reward RNNs feed each caption
    *column* as a length-N batch-size-1 sequence with a persistent
    ``(2, 1, H)`` hidden (reference models.py:120-135): per column, the
    forward direction consumes samples 0..N-1 with the carried forward
    state, the backward direction consumes samples N-1..0 with the
    carried backward state, and BOTH carries thread across the outer
    per-column loop and across calls until ``init_hidden``.

    Args:
      xs_tne: embedded caption columns ``[T, N, E]`` (time-major).
      carry: ``(fwd_state, bwd_state)`` — each the cell's state with
        ``[H]``-shaped leaves (``(h, c)`` for LSTM, ``h`` for GRU).

    Returns:
      ``(last_column_outputs [N, 2H], new_carry)`` — what the
      reference's ``for t`` loop leaves in ``value_rnn_output``.
    """

    def col(state, x_ne):
        cf, cb = state
        outs_f, cf = flat_stream_scan(cell_kind, fwd_params, x_ne, cf, precision=precision)
        outs_b_rev, cb = flat_stream_scan(
            cell_kind, bwd_params, x_ne[::-1], cb, precision=precision
        )
        return (cf, cb), jnp.concatenate([outs_f, outs_b_rev[::-1]], axis=-1)

    new_carry, outs_cols = jax.lax.scan(col, carry, xs_tne)
    return outs_cols[-1], new_carry

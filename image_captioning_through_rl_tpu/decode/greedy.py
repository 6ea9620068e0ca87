"""Greedy decoding.

The reference re-runs the policy LSTM over the *entire* growing prefix
for every generated token (trainers.py:57-70), i.e. O(T^2) recurrent
work per caption. Because a unidirectional LSTM is a deterministic
recurrence, carrying ``(h, c)`` across steps produces the exact same
logits with O(T) work — :func:`greedy_decode` is a single ``lax.scan``
whose carried state replaces the re-encode, token-for-token equivalent
to the reference under argmax.

Like the reference, decoding always runs the full ``max_len - 1`` steps
and does not stop at <END> (static shapes; the text decoder trims at
<END> later, utilities.py:116-140).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import NetConfig
from ..models import policy as policy_mod


def greedy_decode(
    params: dict,
    cfg: NetConfig,
    features: jax.Array,
    start_tokens: jax.Array,
    max_len: int | None = None,
) -> jax.Array:
    """Greedy argmax decode with carried LSTM state (both direction
    modes — the bidirectional step carries the forward state and
    recomputes the single backward cell the last position needs, see
    models/policy.py).

    Args:
      params: policy parameters.
      features: ``[N, F]`` image features.
      start_tokens: ``[N]`` — the <START> column of the caption batch
        (reference seeds with ``captions[:, 0:1]``, trainers.py:66).
      max_len: total caption length including the start token
        (default ``cfg.max_seq_len``).

    Returns:
      ``[N, max_len]`` int32 token ids, starting with ``start_tokens``.
    """
    max_len = max_len or cfg.max_seq_len
    state0 = policy_mod.init_decode_state(params, cfg, features)

    def step(carry, _):
        state, tok = carry
        logits, state = policy_mod.step(params, cfg, tok, state)
        nxt = jnp.argmax(logits, axis=-1).astype(tok.dtype)
        return (state, nxt), nxt

    (_, _), toks = jax.lax.scan(step, (state0, start_tokens), None, length=max_len - 1)
    return jnp.concatenate([start_tokens[:, None], jnp.swapaxes(toks, 0, 1)], axis=1)


def greedy_decode_full_prefix(
    params: dict,
    cfg: NetConfig,
    features: jax.Array,
    start_tokens: jax.Array,
    max_len: int | None = None,
) -> jax.Array:
    """Greedy decode that re-encodes the whole prefix each step.

    Literal reference semantics (trainers.py:67-69) — O(T^2). Kept as
    the reference-exact oracle for BOTH direction modes: the carried
    :func:`greedy_decode` now matches it for bidirectional policies too
    (decode reads only the last position, whose backward hidden is one
    cell from the fixed backward initial state — models/policy.py), so
    this variant's remaining role is parity testing, not serving. The
    step loop is unrolled in Python: each iteration's prefix length is
    static, so the whole decode still jits as one graph of 16 growing
    forwards.
    """
    max_len = max_len or cfg.max_seq_len
    toks = [start_tokens.astype(jnp.int32)]
    for t in range(max_len - 1):
        prefix = jnp.stack(toks, axis=1)  # [N, t+1]
        logits = policy_mod.forward(params, cfg, features, prefix)
        toks.append(jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32))
    return jnp.stack(toks, axis=1)

"""Stochastic sampling decode: temperature / top-k / nucleus (top-p).

The reference decodes only deterministically — greedy argmax
(trainers.py:57-70) and the value-guided beam (trainers.py:75-130); its
only sampler is the training-time rollout draw (trainers.py:445-450),
which it never exposes as a decoding mode. A production captioning
service wants stochastic decode too (diverse captions, n-best lists,
creativity/temperature knobs), so this module adds it TPU-native: one
``lax.scan`` over the carried LSTM state (same O(T) recurrence as
:func:`..decode.greedy.greedy_decode`), with the whole batch sampled
per step by a single on-chip categorical draw — no host round trips,
no dynamic shapes, one compile per (top_k, nucleus on/off) variant.

Filtering follows the standard truncated-sampling semantics:

* ``temperature`` scales logits ``l / t`` before anything else
  (``t -> 0`` approaches greedy; ``t = 0`` is routed to the exact
  argmax decode by the callers in :mod:`..api`).
* ``top_k`` keeps the k highest logits per row. Ties AT the k-th value
  are all kept (measure-zero for real-valued logits).
* ``top_p`` keeps the smallest prefix of the probability-sorted vocab
  whose mass reaches ``top_p`` (the token that crosses the boundary is
  included, so at least one token always survives).

``top_k`` is a static Python int (it shapes the ``lax.top_k`` call);
``temperature`` and ``top_p`` are traced scalars, so sweeping them
costs no recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import NetConfig
from ..models import policy as policy_mod
from ..ops.sampling import sample_categorical


def filter_logits(logits: jax.Array, top_k: int = 0, top_p=None) -> jax.Array:
    """Mask ``[N, V]`` logits to the top-k / nucleus set (else ``-inf``).

    ``top_k <= 0`` disables the k filter; ``top_p=None`` disables the
    nucleus filter (pass a traced scalar in ``(0, 1]`` to enable — 1.0
    keeps everything but still pays the sort, so callers gate on the
    Python value). When both are given, top-k applies first and the
    nucleus mass is computed over the renormalized survivors, matching
    the conventional composition order.
    """
    if top_k and 0 < top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    if top_p is not None:
        sorted_desc = -jnp.sort(-logits, axis=-1)
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # minimal prefix reaching top_p: position i survives iff the
        # mass STRICTLY BEFORE it is < top_p (so the crossing token and
        # always the argmax stay in)
        keep_sorted = (cum - probs) < top_p
        n_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)
        thr = jnp.take_along_axis(sorted_desc, n_keep - 1, axis=-1)
        logits = jnp.where(logits >= thr, logits, -jnp.inf)
    return logits


def sample_decode(
    params: dict,
    cfg: NetConfig,
    features: jax.Array,
    start_tokens: jax.Array,
    rng: jax.Array,
    max_len: int | None = None,
    temperature=1.0,
    top_k: int = 0,
    top_p=None,
) -> jax.Array:
    """Ancestral sampling with carried LSTM state (both direction
    modes — see models/policy.py for why the bidirectional step is
    exactly steppable).

    Same contract as :func:`..decode.greedy.greedy_decode` — returns
    ``[N, max_len]`` int32 ids starting with ``start_tokens``, always
    running the full static length (the text decoder trims at <END>,
    reference utilities.py:116-140) — but each next token is drawn from
    the filtered softmax instead of argmax. ``rng`` is a jax PRNG key;
    the per-step keys split from it inside the scan, so equal keys give
    bit-identical captions and the draw stream is independent of batch
    composition only through row order (each row has its own Gumbel
    noise within the shared per-step draw).
    """
    max_len = max_len or cfg.max_seq_len
    state0 = policy_mod.init_decode_state(params, cfg, features)

    def step(carry, _):
        state, tok, key = carry
        logits, state = policy_mod.step(params, cfg, tok, state)
        key, sub = jax.random.split(key)
        scaled = filter_logits(
            logits.astype(jnp.float32) / temperature, top_k, top_p)
        nxt = sample_categorical(sub, scaled).astype(tok.dtype)
        return (state, nxt, key), nxt

    (_, _, _), toks = jax.lax.scan(
        step, (state0, start_tokens, rng), None, length=max_len - 1)
    return jnp.concatenate(
        [start_tokens[:, None], jnp.swapaxes(toks, 0, 1)], axis=1)


def sample_decode_full_prefix(
    params: dict,
    cfg: NetConfig,
    features: jax.Array,
    start_tokens: jax.Array,
    rng: jax.Array,
    max_len: int | None = None,
    temperature=1.0,
    top_k: int = 0,
    top_p=None,
) -> jax.Array:
    """Sampling decode that re-encodes the whole prefix each step —
    the reference-literal O(T^2) oracle (same structure as
    ``greedy_decode_full_prefix``; :func:`sample_decode` now serves
    bidirectional policies too). The Python-unrolled loop still jits as
    one graph of growing forwards; the per-step key schedule matches
    :func:`sample_decode`, so the two are bit-identical in either
    direction mode.
    """
    max_len = max_len or cfg.max_seq_len
    toks = [start_tokens.astype(jnp.int32)]
    key = rng
    for _ in range(max_len - 1):
        prefix = jnp.stack(toks, axis=1)
        logits = policy_mod.forward(params, cfg, features, prefix)[:, -1, :]
        key, sub = jax.random.split(key)
        scaled = filter_logits(
            logits.astype(jnp.float32) / temperature, top_k, top_p)
        toks.append(sample_categorical(sub, scaled).astype(jnp.int32))
    return jnp.stack(toks, axis=1)


def sample_decode_n(
    params: dict,
    cfg: NetConfig,
    features: jax.Array,
    start_tokens: jax.Array,
    rng: jax.Array,
    num_samples: int,
    **kw,
) -> jax.Array:
    """``num_samples`` independent captions per image: ``[N, R, T]``.

    Tiles each feature row ``R`` times (samples-minor, so row ``i``'s
    drafts are ``out[i]``) and runs ONE batched decode — the n-best
    list costs a single scan over an ``N*R`` batch, not ``R`` passes.
    """
    if num_samples < 1:
        raise ValueError(f"num_samples must be >= 1, got {num_samples}")
    n = features.shape[0]
    feats = jnp.repeat(features, num_samples, axis=0)
    starts = jnp.repeat(start_tokens, num_samples, axis=0)
    # carried-state decode serves BOTH direction modes (the bidi step
    # needs only one backward cell per token — models/policy.py); the
    # full-prefix variant stays as the reference-literal oracle
    toks = sample_decode(params, cfg, feats, starts, rng, **kw)
    return toks.reshape(n, num_samples, toks.shape[-1])

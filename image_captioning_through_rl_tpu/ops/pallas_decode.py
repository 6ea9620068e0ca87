"""Fused greedy-decode Pallas TPU kernel.

The XLA path (:func:`..decode.greedy.greedy_decode`) is a ``lax.scan``
whose 16 steps each re-read the LSTM weights from HBM — at decode batch
sizes the step is bandwidth-bound on ~13 MB of weights per step. This
kernel runs the *entire* decode loop on-core with every weight resident
in VMEM (loaded once per batch tile, not once per token):

  * grid over batch tiles; weight blocks use constant index maps so
    Mosaic hoists their DMA out of the grid loop;
  * token embedding lookup as a one-hot matmul (``[B, V] @ [V, E]``) —
    dynamic row gathers don't vectorize on TPU, but a one-hot matmul is
    a few microseconds on the MXU;
  * LSTM cell + vocab head + argmax fused per step inside a
    ``fori_loop``; the only HBM traffic after the tile loads is the
    ``[B, T]`` token output;
  * weights can be stored bf16 (halves VMEM and doubles MXU rate) with
    f32 accumulation; padded vocab columns get a _NEG head bias so
    argmax never selects them.

Greedy argmax is tolerant of bf16 weight rounding; the float32 variant
is bit-comparable to the XLA path and is what the parity tests use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# The Mosaic default scoped-VMEM budget is 16 MiB — a compiler default,
# not the hardware: v5e has 128 MiB of VMEM per core. Every kernel in
# this package compiles with this raised budget (bigger batch tiles, no
# 16 MiB cliffs) while staying far below the physical capacity.
VMEM_LIMIT = 64 * 1024 * 1024

# Padded-vocab-column suppression bias: one sentinel shared by every
# decode/rollout kernel so the "a padded column must never win
# argmax/top-k" invariant uses a single constant.
_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lstm_gate_split(gates, hidden: int):
    """``(i, f, g, o)`` activations from pre-activation ``gates
    [N, 4H]`` — the ONE definition of the gate slicing + nonlinearity
    block, shared by every kernel module (the slice arithmetic is the
    error-prone part; the gate MATMUL layouts legitimately differ per
    kernel and stay local)."""
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])
    return i, f, g, o


def _pad_rows(x, n_pad: int):
    """Pad the batch axis to ``n_pad`` by replicating the last row.

    Replicate (not zero) so padded rows follow real compute paths; the
    public wrappers slice padding off, and under autodiff the pad's
    transpose (a slice) zeroes the padded cotangents. Shared by every
    kernel module (one definition — the padding strategy is a measured
    decision)."""
    n = x.shape[0]
    if n_pad == n:
        return x
    return jnp.concatenate(
        [x, jnp.broadcast_to(x[-1:], (n_pad - n,) + x.shape[1:])], axis=0
    )


def _kernel(feats_ref, start_ref, wc_ref, bc_ref, emb_ref, wi_ref, wh_ref,
            b_ref, wo_ref, bo_ref, out_ref, *, steps: int):
    f32 = jnp.float32
    h = jnp.dot(feats_ref[:], wc_ref[:], preferred_element_type=f32) + bc_ref[:]
    c = jnp.zeros_like(h)
    tok = start_ref[0:1, :]  # [1, B] int32 (time-major layout)
    out_ref[0:1, :] = tok

    bn = feats_ref.shape[0]
    vp = emb_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
    wdtype = emb_ref.dtype
    hidden = wh_ref.shape[0]

    def body(t, carry):
        h, c, tok = carry
        onehot = (col_ids == tok.reshape(bn, 1)).astype(wdtype)
        x = jnp.dot(onehot, emb_ref[:], preferred_element_type=f32)
        gates = (
            jnp.dot(x.astype(wdtype), wi_ref[:], preferred_element_type=f32)
            + jnp.dot(h.astype(wdtype), wh_ref[:], preferred_element_type=f32)
            + b_ref[:]
        )
        i, f, g, o = _lstm_gate_split(gates, hidden)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        logits = jnp.dot(h.astype(wdtype), wo_ref[:], preferred_element_type=f32) + bo_ref[:]
        tok = jnp.argmax(logits, axis=1).astype(jnp.int32).reshape(1, bn)
        out_ref[pl.ds(t + 1, 1), :] = tok  # dynamic sublane row store
        return h, c, tok

    jax.lax.fori_loop(0, steps, body, (h, c, tok))


@functools.partial(
    jax.jit, static_argnames=("max_len", "block_n", "weight_dtype", "interpret")
)
def fused_greedy_decode(
    params: dict,
    features: jax.Array,
    start_tokens: jax.Array,
    max_len: int = 17,
    block_n: int = 1024,
    weight_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Greedy decode via the fused kernel (unidirectional policies).

    Args mirror :func:`..decode.greedy.greedy_decode`; ``weight_dtype``
    selects the resident-weight precision (bf16 default, f32 for exact
    parity with the XLA path). Batch and vocab are padded to hardware
    tiles internally.
    """
    if "lstm" not in params:
        raise ValueError("fused decode requires a unidirectional policy")
    n, feat_dim = features.shape
    vocab, emb_dim = params["embedding"].shape
    hidden = params["lstm"]["wh"].shape[0]

    vp = _round_up(vocab, 128)
    # adaptive tile: never pad the batch past the next lane multiple
    # (this kernel keeps the batch on the LANE axis, so tiles are
    # multiples of 128). The old force-to-128 single-tile clamp was a
    # workaround for the 16 MiB default scoped-VMEM budget; the kernel
    # now compiles with a 64 MiB budget (measured best tile 1024).
    block_n = min(block_n, _round_up(n, 128))
    n_pad = _round_up(n, block_n)
    wd = weight_dtype

    emb = jnp.zeros((vp, emb_dim), wd).at[:vocab].set(params["embedding"].astype(wd))
    wo = jnp.zeros((hidden, vp), wd).at[:, :vocab].set(params["head"]["w"].astype(wd))
    bo = jnp.full((1, vp), _NEG, jnp.float32).at[0, :vocab].set(
        params["head"]["b"].astype(jnp.float32)
    )
    wc = params["cnn2linear"]["w"].astype(wd)
    bc = params["cnn2linear"]["b"].astype(jnp.float32)[None, :]
    wi = params["lstm"]["wi"].astype(wd)
    wh = params["lstm"]["wh"].astype(wd)
    b = params["lstm"]["b"].astype(jnp.float32)[None, :]

    feats = jnp.zeros((n_pad, feat_dim), jnp.float32).at[:n].set(
        features.astype(jnp.float32)
    )
    start = jnp.zeros((1, n_pad), jnp.int32).at[0, :n].set(start_tokens.astype(jnp.int32))

    grid = (n_pad // block_n,)

    def tile(i):  # batch-tiled operands (batch on the leading axis)
        return (i, 0)

    def tile_minor(i):  # batch-tiled operands (batch on the minor axis)
        return (0, i)

    def whole(i):  # weight operands: constant index -> DMA hoisted
        return (0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, steps=max_len - 1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, feat_dim), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), tile_minor, memory_space=pltpu.VMEM),
            pl.BlockSpec((feat_dim, hidden), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((vp, emb_dim), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((emb_dim, 4 * hidden), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 4 * hidden), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, vp), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((max_len, block_n), tile_minor, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((max_len, n_pad), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(feats, start, wc, bc, emb, wi, wh, b, wo, bo)
    return out.T[:n]

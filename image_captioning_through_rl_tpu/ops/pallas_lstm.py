"""Fused teacher-forced LSTM chain (forward + hand-written VJP).

The pretraining steps are dominated by a sequential LSTM scan whose
per-step matmuls are too small for XLA to keep the MXU busy (policy XE:
~33% MFU). Unlike the rollout (ops/pallas_rollout.py) the token inputs
are all known up front, so everything EXCEPT the hidden chain batches
over ``N*T`` — the vocab head, the loss, and the head backward stay in
XLA as single large matmuls, and this module fuses only the chain:

  * forward: grid over (batch tile, step); per cell an embedding
    lookup (one-hot MXU matmul) and the concat-form gate matmul with
    states carried in VMEM scratch; emits ``h``/``c``/gate streams
    (step-major ``[T*N, X]``).
  * backward: reverse grid; consumes the upstream ``dh`` stream (the
    head matmul's gradient, computed in XLA) plus the forward tape,
    carries (dh, dc), accumulates the fused ``[wi;wh]`` weight gradient
    and bias in VMEM-resident f32 outputs, and streams per-step ``dx``
    for the embedding segment-sum outside. ``h_prev``/``c_prev`` are
    not taped — they are the forward streams shifted by one step, which
    the wrapper builds in XLA for free.

Wrapped in ``jax.custom_vjp``; gradients match ``jax.grad`` of the XLA
``lstm_scan`` at float-rounding tolerance (tests/test_pallas_lstm.py).
Weights are bf16-resident (XLA DEFAULT's rounding class); pass
``weight_dtype=jnp.float32`` + ``interpret=True`` for exact CPU tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import VMEM_LIMIT, _lstm_gate_split, _pad_rows, _round_up


def _fwd_kernel(
    tok_ref, h0_ref, c0_ref, emb_ref, w_ref, b_ref,
    h_ref, c_ref, g_ref,
    sh, sc,
    *, hidden: int,
):
    f32 = jnp.float32
    s = pl.program_id(1)
    bn = h0_ref.shape[0]
    vp = emb_ref.shape[0]
    wd = emb_ref.dtype

    @pl.when(s == 0)
    def _init():
        sh[:] = h0_ref[:]
        sc[:] = c0_ref[:]

    h, c = sh[:], sc[:]
    col_v = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
    x = jnp.dot((col_v == tok_ref[:]).astype(wd), emb_ref[:], preferred_element_type=f32)
    xh = jnp.concatenate([x, h], axis=1)
    gates = jnp.dot(xh.astype(wd), w_ref[:], preferred_element_type=f32) + b_ref[:]
    i, f, g, o = _lstm_gate_split(gates, hidden)
    g_ref[:, :] = jnp.concatenate([i, f, g, o], axis=1)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    sh[:] = h_new
    sc[:] = c_new
    h_ref[:, :] = h_new
    c_ref[:, :] = c_new


def _bwd_kernel(
    dh_ref, tok_ref, hprev_ref, cprev_ref, g_ref,
    emb_ref, w_ref,
    dx_ref, dh0_ref, dc0_ref, dw_ref, db_ref,
    sdh, sdc,
    *, hidden: int,
):
    f32 = jnp.float32
    i_t = pl.program_id(0)
    s = pl.program_id(1)
    bn = dh_ref.shape[0]
    vp = emb_ref.shape[0]
    wd = w_ref.dtype

    @pl.when(s == 0)
    def _init_carry():
        sdh[:] = jnp.zeros_like(sdh)
        sdc[:] = jnp.zeros_like(sdc)

    @pl.when(jnp.logical_and(i_t == 0, s == 0))
    def _init_accums():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)

    gates = g_ref[:]
    i = gates[:, :hidden]
    f = gates[:, hidden : 2 * hidden]
    g = gates[:, 2 * hidden : 3 * hidden]
    o = gates[:, 3 * hidden :]
    c_prev = cprev_ref[:]
    c_new = f * c_prev + i * g
    tc = jnp.tanh(c_new)

    dh = sdh[:] + dh_ref[:]  # chain carry + upstream (head) gradient
    dc = sdc[:]
    do = dh * tc
    dct = dh * o * (1.0 - tc * tc) + dc
    di = dct * g
    dg = dct * i
    df = dct * c_prev
    dc_prev = dct * f
    dgates = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g), do * o * (1.0 - o)],
        axis=1,
    )
    col_v = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
    x = jnp.dot((col_v == tok_ref[:]).astype(wd), emb_ref[:], preferred_element_type=f32)
    xh = jnp.concatenate([x, hprev_ref[:]], axis=1)
    dw_ref[:, :] += jax.lax.dot_general(
        xh.astype(wd), dgates.astype(wd),
        dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    db_ref[:, :] += jnp.sum(dgates, axis=0, keepdims=True)
    dxh = jax.lax.dot_general(
        dgates.astype(wd), w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=f32,
    )
    emb_dim = emb_ref.shape[1]
    dx_ref[:, :] = dxh[:, :emb_dim]
    sdh[:] = dxh[:, emb_dim:]
    sdc[:] = dc_prev
    dh0_ref[:, :] = sdh[:]
    dc0_ref[:, :] = sdc[:]


def _specs(bn, tiles, steps):
    vm = lambda shape, index_map: pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)  # noqa: E731
    tile = lambda i, s: (i, 0)  # noqa: E731
    whole = lambda i, s: (0, 0)  # noqa: E731
    stream = lambda i, s: (s * tiles + i, 0)  # noqa: E731
    rev = lambda i, s: ((steps - 1 - s) * tiles + i, 0)  # noqa: E731
    return vm, tile, whole, stream, rev


@functools.lru_cache(maxsize=None)
def _make_chain(steps: int, bn: int, hidden: int, emb_dim: int, vp: int,
                weight_dtype_name: str, interpret: bool):
    wd = jnp.bfloat16 if weight_dtype_name == "bfloat16" else jnp.float32
    f32 = jnp.float32

    def run_fwd(tok_sm, h0, c0, emb, w, b):
        n_pad = h0.shape[0]
        tiles = n_pad // bn
        vm, tile, whole, stream, _ = _specs(bn, tiles, steps)
        row = lambda width: jax.ShapeDtypeStruct((steps * n_pad, width), f32)  # noqa: E731
        return pl.pallas_call(
            functools.partial(_fwd_kernel, hidden=hidden),
            grid=(tiles, steps),
            in_specs=[
                vm((bn, 1), stream),
                vm((bn, hidden), tile), vm((bn, hidden), tile),
                vm((vp, emb_dim), whole),
                vm((emb_dim + hidden, 4 * hidden), whole), vm((1, 4 * hidden), whole),
            ],
            out_specs=(
                vm((bn, hidden), stream), vm((bn, hidden), stream),
                vm((bn, 4 * hidden), stream),
            ),
            out_shape=(row(hidden), row(hidden), row(4 * hidden)),
            scratch_shapes=[pltpu.VMEM((bn, hidden), f32)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT,
            ),
            interpret=interpret,
        )(tok_sm, h0, c0, emb.astype(wd), w.astype(wd), b.astype(f32))

    def run_bwd(dh_sm, tok_sm, hprev_sm, cprev_sm, g_sm, emb_c, w_c):
        n_pad = dh_sm.shape[0] // steps
        tiles = n_pad // bn
        vm, tile, whole, stream, rev = _specs(bn, tiles, steps)
        return pl.pallas_call(
            functools.partial(_bwd_kernel, hidden=hidden),
            grid=(tiles, steps),
            in_specs=[
                vm((bn, hidden), rev),    # upstream dh
                vm((bn, 1), rev),         # tokens
                vm((bn, hidden), rev), vm((bn, hidden), rev),  # h_prev, c_prev
                vm((bn, 4 * hidden), rev),
                vm((vp, emb_dim), whole),
                vm((emb_dim + hidden, 4 * hidden), whole),
            ],
            out_specs=(
                vm((bn, emb_dim), rev),
                vm((bn, hidden), tile), vm((bn, hidden), tile),
                vm((emb_dim + hidden, 4 * hidden), whole), vm((1, 4 * hidden), whole),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((steps * n_pad, emb_dim), f32),
                jax.ShapeDtypeStruct((n_pad, hidden), f32),
                jax.ShapeDtypeStruct((n_pad, hidden), f32),
                jax.ShapeDtypeStruct((emb_dim + hidden, 4 * hidden), f32),
                jax.ShapeDtypeStruct((1, 4 * hidden), f32),
            ),
            scratch_shapes=[pltpu.VMEM((bn, hidden), f32)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT,
            ),
            interpret=interpret,
        )(dh_sm, tok_sm, hprev_sm, cprev_sm, g_sm, emb_c, w_c)

    @jax.custom_vjp
    def chain(tok_sm, h0, c0, emb, w, b):
        hs, _, _ = run_fwd(tok_sm, h0, c0, emb, w, b)
        return hs

    def chain_fwd(tok_sm, h0, c0, emb, w, b):
        hs, cs, gs = run_fwd(tok_sm, h0, c0, emb, w, b)
        return hs, (tok_sm, h0, c0, hs, cs, gs, emb.astype(wd), w.astype(wd))

    def chain_bwd(res, dhs):
        import numpy as np

        tok_sm, h0, c0, hs, cs, gs, emb_c, w_c = res
        n_pad = h0.shape[0]
        # shifted streams: states ENTERING step s (step-major layout)
        hprev = jnp.concatenate([h0, hs[: (steps - 1) * n_pad]], axis=0)
        cprev = jnp.concatenate([c0, cs[: (steps - 1) * n_pad]], axis=0)
        dx, dh0, dc0, dw, db = run_bwd(dhs, tok_sm, hprev, cprev, gs, emb_c, w_c)
        demb = jax.ops.segment_sum(dx, tok_sm[:, 0], num_segments=vp)
        fz = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
        return fz(tok_sm), dh0, dc0, demb, dw, db

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def fused_lstm_chain(
    lstm_params: dict,
    embedding: jax.Array,
    tokens: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    block_n: int = 128,
    weight_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Teacher-forced LSTM over ``tokens [N, T]`` from ``(h0, c0)``.

    Returns ``hs [N, T, H]`` (the per-step outputs, like
    ``ops.rnn.lstm_scan`` transposed); differentiable wrt the cell
    parameters, embedding table, and initial state through the Pallas
    VJP. ``lstm_params``: ``{"wi": [E, 4H], "wh": [H, 4H], "b": [4H]}``.
    """
    n, t = tokens.shape
    hidden = h0.shape[-1]
    vocab, emb_dim = embedding.shape
    vp = _round_up(vocab, 128)
    block_n = min(block_n, max(8, _round_up(n, 8)))
    n_pad = _round_up(n, block_n)
    f32 = jnp.float32

    pad_rows = lambda x: _pad_rows(x, n_pad)  # noqa: E731

    tok_sm = jnp.swapaxes(pad_rows(tokens.astype(jnp.int32)), 0, 1).reshape(t * n_pad, 1)
    emb_pad = jnp.pad(embedding.astype(f32), ((0, vp - vocab), (0, 0)))
    w = jnp.concatenate([lstm_params["wi"], lstm_params["wh"]], axis=0)
    chain = _make_chain(t, block_n, hidden, emb_dim, vp,
                        jnp.dtype(weight_dtype).name, interpret)
    hs = chain(tok_sm, pad_rows(h0.astype(f32)), pad_rows(c0.astype(f32)),
               emb_pad, w, lstm_params["b"][None, :])
    return jnp.swapaxes(hs.reshape(t, n_pad, hidden), 0, 1)[:n]

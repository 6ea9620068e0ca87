"""Fused teacher-forced GRU chain (forward + hand-written VJP).

The GRU sibling of :mod:`.pallas_lstm`, for the reward network's
caption encoder (the VSE pretraining step runs at ~10% MFU under XLA's
scan). The GRU cannot fuse its input and recurrent projections into one
matmul — the candidate gate needs the recurrent term separately for the
reset product (``n = tanh(gi_n + r * gh_n)``, ops/rnn.gru_cell) — so
each step runs two MXU matmuls from VMEM-resident weights. The tape
saves the post-activation gates ``(r, z, n)`` and the recurrent
candidate term ``gh_n`` (needed for ``dr``); ``h_prev`` is the forward
output stream shifted one step.

Gradients match ``jax.grad`` of ``gru_scan`` at float tolerance
(tests/test_pallas_lstm.py). Weights are bf16-resident; pass
``weight_dtype=jnp.float32`` + ``interpret=True`` for exact CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import VMEM_LIMIT, _pad_rows, _round_up
from .pallas_lstm import _specs


def _fwd_kernel(
    tok_ref, h0_ref, emb_ref, wi_ref, wh_ref, bi_ref, bh_ref,
    h_ref, g_ref, ghn_ref,
    sh,
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

    h = sh[:]
    col_v = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
    x = jnp.dot((col_v == tok_ref[:]).astype(wd), emb_ref[:], preferred_element_type=f32)
    gi = jnp.dot(x.astype(wd), wi_ref[:], preferred_element_type=f32) + bi_ref[:]
    gh = jnp.dot(h.astype(wd), wh_ref[:], preferred_element_type=f32) + bh_ref[:]
    r = jax.nn.sigmoid(gi[:, :hidden] + gh[:, :hidden])
    z = jax.nn.sigmoid(gi[:, hidden : 2 * hidden] + gh[:, hidden : 2 * hidden])
    gh_n = gh[:, 2 * hidden :]
    n = jnp.tanh(gi[:, 2 * hidden :] + r * gh_n)
    h_new = (1.0 - z) * n + z * h
    g_ref[:, :] = jnp.concatenate([r, z, n], axis=1)
    ghn_ref[:, :] = gh_n
    sh[:] = h_new
    h_ref[:, :] = h_new


def _bwd_kernel(
    dh_ref, tok_ref, hprev_ref, g_ref, ghn_ref,
    emb_ref, wi_ref, wh_ref,
    dx_ref, dh0_ref, dwi_ref, dwh_ref, dbi_ref, dbh_ref,
    sdh,
    *, hidden: int,
):
    f32 = jnp.float32
    i_t = pl.program_id(0)
    s = pl.program_id(1)
    bn = dh_ref.shape[0]
    vp = emb_ref.shape[0]
    wd = wi_ref.dtype

    @pl.when(s == 0)
    def _init_carry():
        sdh[:] = jnp.zeros_like(sdh)

    @pl.when(jnp.logical_and(i_t == 0, s == 0))
    def _init_accums():
        dwi_ref[:, :] = jnp.zeros_like(dwi_ref)
        dwh_ref[:, :] = jnp.zeros_like(dwh_ref)
        dbi_ref[:, :] = jnp.zeros_like(dbi_ref)
        dbh_ref[:, :] = jnp.zeros_like(dbh_ref)

    gates = g_ref[:]
    r = gates[:, :hidden]
    z = gates[:, hidden : 2 * hidden]
    n = gates[:, 2 * hidden :]
    gh_n = ghn_ref[:]
    h_prev = hprev_ref[:]

    dh = sdh[:] + dh_ref[:]
    dz = dh * (h_prev - n)
    dn = dh * (1.0 - z)
    dh_direct = dh * z
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * gh_n
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)
    dgi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
    dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=1)

    col_v = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
    x = jnp.dot((col_v == tok_ref[:]).astype(wd), emb_ref[:], preferred_element_type=f32)
    dwi_ref[:, :] += jax.lax.dot_general(
        x.astype(wd), dgi.astype(wd),
        dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=f32)
    dwh_ref[:, :] += jax.lax.dot_general(
        h_prev.astype(wd), dgh.astype(wd),
        dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=f32)
    dbi_ref[:, :] += jnp.sum(dgi, axis=0, keepdims=True)
    dbh_ref[:, :] += jnp.sum(dgh, axis=0, keepdims=True)
    dx_ref[:, :] = jax.lax.dot_general(
        dgi.astype(wd), wi_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=f32)
    sdh[:] = (
        jax.lax.dot_general(
            dgh.astype(wd), wh_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=f32)
        + dh_direct
    )
    dh0_ref[:, :] = sdh[:]


@functools.lru_cache(maxsize=None)
def _make_chain(steps: int, bn: int, hidden: int, emb_dim: int, vp: int,
                weight_dtype_name: str, interpret: bool):
    wd = jnp.bfloat16 if weight_dtype_name == "bfloat16" else jnp.float32
    f32 = jnp.float32

    def run_fwd(tok_sm, h0, emb, wi, wh, bi, bh):
        n_pad = h0.shape[0]
        tiles = n_pad // bn
        vm, tile, whole, stream, _ = _specs(bn, tiles, steps)
        row = lambda width: jax.ShapeDtypeStruct((steps * n_pad, width), f32)  # noqa: E731
        return pl.pallas_call(
            functools.partial(_fwd_kernel, hidden=hidden),
            grid=(tiles, steps),
            in_specs=[
                vm((bn, 1), stream),
                vm((bn, hidden), tile),
                vm((vp, emb_dim), whole),
                vm((emb_dim, 3 * hidden), whole), vm((hidden, 3 * hidden), whole),
                vm((1, 3 * hidden), whole), vm((1, 3 * hidden), whole),
            ],
            out_specs=(
                vm((bn, hidden), stream), vm((bn, 3 * hidden), stream),
                vm((bn, hidden), stream),
            ),
            out_shape=(row(hidden), row(3 * hidden), row(hidden)),
            scratch_shapes=[pltpu.VMEM((bn, hidden), f32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT,
            ),
            interpret=interpret,
        )(tok_sm, h0, emb.astype(wd), wi.astype(wd), wh.astype(wd),
          bi.astype(f32), bh.astype(f32))

    def run_bwd(dh_sm, tok_sm, hprev_sm, g_sm, ghn_sm, emb_c, wi_c, wh_c):
        n_pad = dh_sm.shape[0] // steps
        tiles = n_pad // bn
        vm, tile, whole, stream, rev = _specs(bn, tiles, steps)
        return pl.pallas_call(
            functools.partial(_bwd_kernel, hidden=hidden),
            grid=(tiles, steps),
            in_specs=[
                vm((bn, hidden), rev),    # upstream dh
                vm((bn, 1), rev),         # tokens
                vm((bn, hidden), rev),    # h_prev
                vm((bn, 3 * hidden), rev),
                vm((bn, hidden), rev),    # gh_n
                vm((vp, emb_dim), whole),
                vm((emb_dim, 3 * hidden), whole), vm((hidden, 3 * hidden), whole),
            ],
            out_specs=(
                vm((bn, emb_dim), rev),
                vm((bn, hidden), tile),
                vm((emb_dim, 3 * hidden), whole), vm((hidden, 3 * hidden), whole),
                vm((1, 3 * hidden), whole), vm((1, 3 * hidden), whole),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((steps * n_pad, emb_dim), f32),
                jax.ShapeDtypeStruct((n_pad, hidden), f32),
                jax.ShapeDtypeStruct((emb_dim, 3 * hidden), f32),
                jax.ShapeDtypeStruct((hidden, 3 * hidden), f32),
                jax.ShapeDtypeStruct((1, 3 * hidden), f32),
                jax.ShapeDtypeStruct((1, 3 * hidden), f32),
            ),
            scratch_shapes=[pltpu.VMEM((bn, hidden), f32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT,
            ),
            interpret=interpret,
        )(dh_sm, tok_sm, hprev_sm, g_sm, ghn_sm, emb_c, wi_c, wh_c)

    @jax.custom_vjp
    def chain(tok_sm, h0, emb, wi, wh, bi, bh):
        hs, _, _ = run_fwd(tok_sm, h0, emb, wi, wh, bi, bh)
        return hs

    def chain_fwd(tok_sm, h0, emb, wi, wh, bi, bh):
        hs, gs, ghn = run_fwd(tok_sm, h0, emb, wi, wh, bi, bh)
        return hs, (tok_sm, h0, hs, gs, ghn, emb.astype(wd), wi.astype(wd), wh.astype(wd))

    def chain_bwd(res, dhs):
        import numpy as np

        tok_sm, h0, hs, gs, ghn, emb_c, wi_c, wh_c = res
        n_pad = h0.shape[0]
        hprev = jnp.concatenate([h0, hs[: (steps - 1) * n_pad]], axis=0)
        dx, dh0, dwi, dwh, dbi, dbh = run_bwd(
            dhs, tok_sm, hprev, gs, ghn, emb_c, wi_c, wh_c)
        demb = jax.ops.segment_sum(dx, tok_sm[:, 0], num_segments=vp)
        fz = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
        return fz(tok_sm), dh0, demb, dwi, dwh, dbi, dbh

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def fused_gru_chain(
    gru_params: dict,
    embedding: jax.Array,
    tokens: jax.Array,
    h0: jax.Array,
    block_n: int = 128,
    weight_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Teacher-forced GRU over ``tokens [N, T]`` from ``h0``.

    Returns ``hs [N, T, H]`` like ``ops.rnn.gru_scan`` transposed;
    differentiable through the Pallas VJP. ``gru_params``:
    ``{"wi": [E, 3H], "wh": [H, 3H], "bi": [3H], "bh": [3H]}``.
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
    chain = _make_chain(t, block_n, hidden, emb_dim, vp,
                        jnp.dtype(weight_dtype).name, interpret)
    hs = chain(tok_sm, pad_rows(h0.astype(f32)), emb_pad,
               gru_params["wi"], gru_params["wh"],
               gru_params["bi"][None, :], gru_params["bh"][None, :])
    return jnp.swapaxes(hs.reshape(t, n_pad, hidden), 0, 1)[:n]

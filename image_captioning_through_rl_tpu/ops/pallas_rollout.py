"""Fused A2C rollout Pallas TPU kernels (forward + hand-written VJP).

The A2C training step's hot core (reference trainers.py:441-459; XLA
version ``train.steps.a2c_rollout_loss``) rolls the policy and value
LSTMs forward for S = T-1 steps: per step, policy logits -> categorical
action -> log-prob, critic value of the current prefix, then both
encoders advance with the placed token (teacher inside the curriculum
prefix, sampled action outside). XLA reaches ~31-40% MFU here — 16
sequential scan iterations of small matmuls — so this module fuses the
whole rollout into two VMEM-resident Pallas programs:

  * ``_rollout_fwd_kernel``: one grid step per (batch tile, rollout
    step); policy head + Gumbel-max sampling + log-softmax + value head
    + both LSTM advances, with the carried states living in VMEM
    scratch across the step axis of the grid. Emits the per-step
    activation tape (cell inputs, entering states, gate activations)
    that the backward pass needs.
  * ``_policy_bwd_kernel`` / ``_value_bwd_kernel``: reverse-order grid
    over the same tape, accumulating the weight gradients in VMEM
    scratch (one f32 accumulator per weight) and emitting per-step
    ``dx`` streams whose embedding-table scatter happens outside.

The REWARD network is deliberately excluded: it is frozen and its
output is stop-gradient'ed (trainers.py:372-373, Q7), so the reward
stream is a cheap XLA scan over the token stream this kernel returns
(``train.steps`` glues them together).

Sampling parity: actions are ``argmax(logits + G)`` where ``G`` is
Gumbel noise generated OUTSIDE with the same per-step keys as
``jax.random.categorical`` uses — the Gumbel-max trick IS
``categorical``, so the fused rollout reproduces the XLA rollout's
sampled tokens exactly (bit-exact under the interpreter; bf16-class on
hardware, where XLA's DEFAULT matmuls are bf16 too).

Numerics: weights live in VMEM as bf16 (same rounding class as XLA
DEFAULT, see ops/pallas_beam.py); accumulations, gate math, the tape,
and all gradient accumulators are f32.

Layouts (Mosaic constraints, see CLAUDE.md): everything is 2D with
step-major row blocks — streams are ``[S*N, X]`` where grid step
``(tile, s)`` touches rows ``[(s*tiles + tile) * bn, ...)``; no
transposes (contractions via ``dot_general`` dimension numbers), no
dynamic lane indexing (teacher columns are pre-transposed host-side).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import VMEM_LIMIT as _VMEM_LIMIT
from .pallas_decode import _NEG, _lstm_gate_split, _pad_rows, _round_up
from .pallas_lstm import _specs


def _lstm_gates(xh, w, b, hidden):
    """Concat-form LSTM gates ([x;h] @ [wi;wh] — ops/rnn.lstm_cell)."""
    f32 = jnp.float32
    gates = jnp.dot(xh.astype(w.dtype), w, preferred_element_type=f32) + b
    return _lstm_gate_split(gates, hidden)


def _gru_step(tok, h, col_v, r_emb_ref, r_wi_ref, r_wh_ref, r_bi_ref,
              r_bh_ref, hidden):
    """One GRU advance from a one-hot token gather (reward encoder)."""
    f32 = jnp.float32
    wd = r_emb_ref.dtype
    x = jnp.dot((col_v == tok).astype(wd), r_emb_ref[:], preferred_element_type=f32)
    gi = jnp.dot(x.astype(wd), r_wi_ref[:], preferred_element_type=f32) + r_bi_ref[:]
    gh = jnp.dot(h.astype(wd), r_wh_ref[:], preferred_element_type=f32) + r_bh_ref[:]
    r = jax.nn.sigmoid(gi[:, :hidden] + gh[:, :hidden])
    z = jax.nn.sigmoid(gi[:, hidden : 2 * hidden] + gh[:, hidden : 2 * hidden])
    n = jnp.tanh(gi[:, 2 * hidden :] + r * gh[:, 2 * hidden :])
    return (1.0 - z) * n + z * h


def _rollout_fwd_kernel(
    *refs, hidden: int, fuse_reward: bool, tape_gates: bool,
):
    """Forward rollout grid step (one batch tile x one rollout step).

    Static variants:
      * ``fuse_reward``: the frozen reward GRU stream (lookahead on the
        sampled action + advance with the placed token) runs INSIDE this
        kernel instead of a separate Pallas program — its 9 extra weight
        refs append to the inputs, a reward stream to the outputs, and
        one carried-state scratch. Saves a program launch plus the
        action/token HBM round trip (round-3 A/B: see BENCHMARKS.md).
      * ``tape_gates``: when False, the gate-activation tape (two
        ``[bn, 4H]`` stores per step — 2/3 of all tape bytes) is NOT
        written; the backward kernels recompute the gates from the
        carried (h, c) tape with one extra matmul per net per step.
    """
    f32 = jnp.float32
    n_in = 20 + (9 if fuse_reward else 0)
    (curr_ref, feats_ref, ph_ref, pc_ref, vh_ref, vc_ref, teach_ref, gumbel_ref,
     p_emb_ref, p_w_ref, p_b_ref, p_hw_ref, p_hb_ref,
     v_emb_ref, v_w_ref, v_b_ref, v_w1_ref, v_b1_ref, v_w2_ref, v_b2_ref) = refs[:20]
    if fuse_reward:
        (rew0_ref, vn_ref, r_emb_ref, r_wi_ref, r_wh_ref, r_bi_ref, r_bh_ref,
         sem_w_ref, sem_b_ref) = refs[20:29]
    pos = n_in
    val_ref, logp_ref, act_ref, tok_ref, hp_ref, cp_ref = refs[pos : pos + 6]
    pos += 6
    if tape_gates:
        gp_ref = refs[pos]
        pos += 1
    hv_ref, cv_ref = refs[pos : pos + 2]
    pos += 2
    if tape_gates:
        gv_ref = refs[pos]
        pos += 1
    if fuse_reward:
        rew_ref = refs[pos]
        pos += 1
    sph, spc, svh, svc = refs[pos : pos + 4]
    pos += 4
    if fuse_reward:
        srh = refs[pos]

    s = pl.program_id(1)
    bn = feats_ref.shape[0]
    vp = p_emb_ref.shape[0]
    wd = p_emb_ref.dtype

    @pl.when(s == 0)
    def _init():
        sph[:] = ph_ref[:]
        spc[:] = pc_ref[:]
        svh[:] = vh_ref[:]
        svc[:] = vc_ref[:]
        if fuse_reward:
            srh[:] = rew0_ref[:]

    h_p, c_p = sph[:], spc[:]
    h_v, c_v = svh[:], svc[:]

    # tape: states ENTERING this step, stored in the tape dtype. f32 is
    # the measured default (a bf16 tape was A/B'd SLOWER at these shapes
    # — cast/relayout outweighs the bandwidth win — and f32 keeps the
    # hand VJP in jax.grad's rounding class; see fused_rollout)
    td = hp_ref.dtype
    hp_ref[:, :] = h_p.astype(td)
    cp_ref[:, :] = c_p.astype(td)
    hv_ref[:, :] = h_v.astype(td)
    cv_ref[:, :] = c_v.astype(td)

    # 1) policy logits for position p = s+1 (mirrors ops/linalg.dense)
    logits = (
        jnp.dot(h_p.astype(wd), p_hw_ref[:], preferred_element_type=f32) + p_hb_ref[:]
    )  # [bn, vp]; padding columns carry -1e30 bias

    # 2) Gumbel-max sampling == jax.random.categorical with the same key
    col_v = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
    noisy = logits + gumbel_ref[:]
    m = jnp.max(noisy, axis=-1, keepdims=True)
    action = jnp.min(jnp.where(noisy == m, col_v, vp), axis=-1, keepdims=True)  # [bn,1]
    act_ref[:, :] = action

    # 3) log-prob, composed exactly like jax.nn.log_softmax
    shifted = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    logp_all = shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))
    hot_a = (col_v == action).astype(f32)
    logp_ref[:, :] = jnp.sum(logp_all * hot_a, axis=-1, keepdims=True)

    # 4) critic on the current prefix (value head over [feats, h_v])
    fh = jnp.concatenate([feats_ref[:], h_v], axis=1)
    v1 = jnp.dot(fh.astype(wd), v_w1_ref[:], preferred_element_type=f32) + v_b1_ref[:]
    value = jnp.dot(v1.astype(wd), v_w2_ref[:], preferred_element_type=f32) + v_b2_ref[:]
    val_ref[:, :] = value[:, 0:1]

    # 5) placed token: teacher inside the curriculum prefix (p < curr)
    p_pos = s + 1
    token = jnp.where(p_pos < curr_ref[0, 0], teach_ref[:], action)
    tok_ref[:, :] = token

    # 5b) frozen reward stream (fused variant): lookahead on the sampled
    # action scores the prefix (trainers.py:459), the placed token
    # advances the carried GRU — identical math to fused_reward_stream
    last = pl.num_programs(1) - 1
    if fuse_reward:
        h_r = srh[:]
        after = _gru_step(action, h_r, col_v, r_emb_ref, r_wi_ref, r_wh_ref,
                          r_bi_ref, r_bh_ref, hidden)
        se = (jnp.dot(after.astype(wd), sem_w_ref[:], preferred_element_type=f32)
              + sem_b_ref[:])
        sn = jnp.sqrt(jnp.sum(se * se, axis=-1, keepdims=True))
        rew_ref[:, :] = (jnp.sum(vn_ref[:] * se, axis=-1, keepdims=True)
                         / jnp.maximum(sn, 1e-12))

        @pl.when(s < last)  # the final advance's output is never read
        def _advance_reward():
            srh[:] = _gru_step(token, h_r, col_v, r_emb_ref, r_wi_ref,
                               r_wh_ref, r_bi_ref, r_bh_ref, hidden)

    # 6/7) advance policy + value encoders with the placed token. The
    # FINAL step's advances are dead work — no step consumes the updated
    # states, and the backward's matching reverse step sees zero
    # cotangents — so they are skipped (same dead-work cut as the beam
    # kernels, ~1/S of the cell compute). The last gate-tape rows still
    # need DEFINED values (0 * garbage = NaN in the backward): zeros.
    if tape_gates:
        @pl.when(s == last)
        def _defined_tape_tail():
            gp_ref[:, :] = jnp.zeros_like(gp_ref)
            gv_ref[:, :] = jnp.zeros_like(gv_ref)

    @pl.when(s < last)
    def _advance_encoders():
        hot_t = (col_v == token).astype(wd)
        x_p = jnp.dot(hot_t, p_emb_ref[:], preferred_element_type=f32)
        i, f, g, o = _lstm_gates(
            jnp.concatenate([x_p, h_p], axis=1), p_w_ref[:], p_b_ref[:], hidden
        )
        if tape_gates:
            gp_ref[:, :] = jnp.concatenate([i, f, g, o], axis=1).astype(td)
        c_new = f * c_p + i * g
        sph[:] = o * jnp.tanh(c_new)
        spc[:] = c_new

        x_v = jnp.dot(hot_t, v_emb_ref[:], preferred_element_type=f32)
        i, f, g, o = _lstm_gates(
            jnp.concatenate([x_v, h_v], axis=1), v_w_ref[:], v_b_ref[:], hidden
        )
        if tape_gates:
            gv_ref[:, :] = jnp.concatenate([i, f, g, o], axis=1).astype(td)
        c_new = f * c_v + i * g
        svh[:] = o * jnp.tanh(c_new)
        svc[:] = c_new


def _fwd_pallas(
    curr, feats, ph1, pc1, vh1, vc1, teach_sm, gumbel_sm,
    p_emb, p_w, p_b, p_hw, p_hb, v_emb, v_w, v_b, v_w1, v_b1, v_w2, v_b2,
    *, steps: int, bn: int, hidden: int, interpret: bool, tape_dtype=jnp.float32,
    reward_operands=None, tape_gates: bool = True,
):
    """``reward_operands``: ``(rew0, vn, r_emb, r_wi, r_wh, r_bi, r_bh,
    sem_w, sem_b)`` enables the fused in-kernel reward stream."""
    n_pad, feat_dim = feats.shape
    vp, emb_dim = p_emb.shape
    tiles = n_pad // bn
    grid = (tiles, steps)
    fuse_reward = reward_operands is not None

    vm, tile, whole, stream, _ = _specs(bn, tiles, steps)

    f32 = jnp.float32
    td = tape_dtype  # f32 default (bf16 measured slower; see fused_rollout)
    row = lambda width, dt=f32: jax.ShapeDtypeStruct((steps * n_pad, width), dt)  # noqa: E731

    out_shape = [
        row(1), row(1), row(1, jnp.int32), row(1, jnp.int32),  # value, logp, action, token
        row(hidden, td), row(hidden, td),                      # h_p, c_p
    ]
    out_specs = [
        vm((bn, 1), stream), vm((bn, 1), stream), vm((bn, 1), stream), vm((bn, 1), stream),
        vm((bn, hidden), stream), vm((bn, hidden), stream),
    ]
    if tape_gates:
        out_shape.append(row(4 * hidden, td))                  # gates_p
        out_specs.append(vm((bn, 4 * hidden), stream))
    out_shape += [row(hidden, td), row(hidden, td)]            # h_v, c_v
    out_specs += [vm((bn, hidden), stream), vm((bn, hidden), stream)]
    if tape_gates:
        out_shape.append(row(4 * hidden, td))                  # gates_v
        out_specs.append(vm((bn, 4 * hidden), stream))
    if fuse_reward:
        out_shape.append(row(1))                               # rewards
        out_specs.append(vm((bn, 1), stream))

    in_specs = [
        vm((1, 1), whole),                     # curr_seq_len
        vm((bn, feat_dim), tile),              # features
        vm((bn, hidden), tile), vm((bn, hidden), tile),   # policy h1, c1
        vm((bn, hidden), tile), vm((bn, hidden), tile),   # value h1, c1
        vm((bn, 1), stream),                   # teachers, step-major
        vm((bn, vp), stream),                  # gumbel, step-major
        vm((vp, emb_dim), whole),
        vm((emb_dim + hidden, 4 * hidden), whole), vm((1, 4 * hidden), whole),
        vm((hidden, vp), whole), vm((1, vp), whole),
        vm((vp, emb_dim), whole),
        vm((emb_dim + hidden, 4 * hidden), whole), vm((1, 4 * hidden), whole),
        vm((feat_dim + hidden, hidden), whole), vm((1, hidden), whole),
        vm((hidden, 128), whole), vm((1, 128), whole),
    ]
    operands = [
        curr, feats, ph1, pc1, vh1, vc1, teach_sm, gumbel_sm,
        p_emb, p_w, p_b, p_hw, p_hb, v_emb, v_w, v_b, v_w1, v_b1, v_w2, v_b2,
    ]
    if fuse_reward:
        in_specs += [
            vm((bn, hidden), tile),            # rew0 (start-token GRU state)
            vm((bn, hidden), tile),            # vn (normalized visual embed)
            vm((vp, emb_dim), whole),
            vm((emb_dim, 3 * hidden), whole), vm((hidden, 3 * hidden), whole),
            vm((1, 3 * hidden), whole), vm((1, 3 * hidden), whole),
            vm((hidden, hidden), whole), vm((1, hidden), whole),
        ]
        operands += list(reward_operands)

    scratch = [pltpu.VMEM((bn, hidden), f32)] * (5 if fuse_reward else 4)
    return pl.pallas_call(
        functools.partial(_rollout_fwd_kernel, hidden=hidden,
                          fuse_reward=fuse_reward, tape_gates=tape_gates),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*operands)


def _cell_bwd(dh_next, dc_next, gates, c_prev, w_ref, hidden):
    """LSTM cell backward from the saved gate activations.

    Returns (dgates_pre [bn, 4H], dxh [bn, E+H], dc_prev)."""
    f32 = jnp.float32
    # the tape may be bf16 on hardware; gate math stays f32
    gates = gates.astype(f32)
    c_prev = c_prev.astype(f32)
    i = gates[:, :hidden]
    f = gates[:, hidden : 2 * hidden]
    g = gates[:, 2 * hidden : 3 * hidden]
    o = gates[:, 3 * hidden :]
    c_new = f * c_prev + i * g
    tc = jnp.tanh(c_new)
    do = dh_next * tc
    dct = dh_next * o * (1.0 - tc * tc) + dc_next
    di = dct * g
    dg = dct * i
    df = dct * c_prev
    dc_prev = dct * f
    dgates = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=1,
    )
    # dxh = dgates @ W^T (contract the 4H axis; no transposes materialized)
    dxh = jax.lax.dot_general(
        dgates.astype(w_ref.dtype), w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    return dgates, dxh, dc_prev


def _outer(a, b, wd):
    """a^T @ b via dot_general row contraction: [bn, X], [bn, Y] -> [X, Y].

    Operands are cast to the kernel's weight dtype so gradient matmuls
    run in the same precision class as the forward (f32 under the
    interpreter for exact jax.grad parity, bf16 on hardware like XLA's
    DEFAULT backward matmuls)."""
    return jax.lax.dot_general(
        a.astype(wd), b.astype(wd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _policy_bwd_kernel(
    # inputs (streams feed REVERSED: grid step s reads real step S-1-s)
    *refs, hidden: int, tape_gates: bool,
):
    f32 = jnp.float32
    if tape_gates:
        (dlogp_ref, hp_ref, cp_ref, gp_ref, act_ref, tok_ref,
         p_emb_ref, p_w_ref, p_hw_ref, p_hb_ref,
         dxp_ref, dph1_ref, dpc1_ref, dw_ref, db_ref, dhw_ref, dhb_ref,
         sdh, sdc) = refs
    else:  # gates recomputed from the (h, c) tape — one extra matmul
        (dlogp_ref, hp_ref, cp_ref, act_ref, tok_ref,
         p_emb_ref, p_w_ref, p_b_ref, p_hw_ref, p_hb_ref,
         dxp_ref, dph1_ref, dpc1_ref, dw_ref, db_ref, dhw_ref, dhb_ref,
         sdh, sdc) = refs
    i_t = pl.program_id(0)
    s = pl.program_id(1)
    last = pl.num_programs(1) - 1
    bn = hp_ref.shape[0]
    vp = p_hw_ref.shape[1]

    @pl.when(s == 0)
    def _init_carry():
        sdh[:] = jnp.zeros_like(sdh)  # the final advance's outputs are unused
        sdc[:] = jnp.zeros_like(sdc)

    @pl.when(jnp.logical_and(i_t == 0, s == 0))
    def _init_accums():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)
        dhw_ref[:, :] = jnp.zeros_like(dhw_ref)
        dhb_ref[:, :] = jnp.zeros_like(dhb_ref)

    h_p = hp_ref[:]
    # head backward: recompute logits/softmax from the entering state
    logits = (
        jnp.dot(h_p.astype(p_hw_ref.dtype), p_hw_ref[:], preferred_element_type=f32)
        + p_hb_ref[:]
    )
    shifted = logits - jnp.max(logits, axis=-1, keepdims=True)
    ex = jnp.exp(shifted)
    softmax = ex / jnp.sum(ex, axis=-1, keepdims=True)
    col_v = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
    hot_a = (col_v == act_ref[:]).astype(f32)
    wd = p_w_ref.dtype
    dlogits = dlogp_ref[:] * (hot_a - softmax)  # [bn, vp]
    dhw_ref[:, :] += _outer(h_p, dlogits, wd)
    dhb_ref[:, :] += jnp.sum(dlogits, axis=0, keepdims=True)
    dh_head = jax.lax.dot_general(
        dlogits.astype(p_hw_ref.dtype), p_hw_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # [bn, H]

    # cell backward for this step's advance; the cell input is
    # recomputed exactly (one-hot matmul on the same-dtype table)
    x_p = jnp.dot((col_v == tok_ref[:]).astype(wd), p_emb_ref[:],
                  preferred_element_type=f32)
    emb_dim = x_p.shape[1]
    xh = jnp.concatenate([x_p, h_p], axis=1)
    if tape_gates:
        gates = gp_ref[:]
    else:
        gi, gf, gg, go = _lstm_gates(xh, p_w_ref[:], p_b_ref[:], hidden)
        gates = jnp.concatenate([gi, gf, gg, go], axis=1)
    dgates, dxh, dc_prev = _cell_bwd(sdh[:], sdc[:], gates, cp_ref[:], p_w_ref, hidden)
    dw_ref[:, :] += _outer(xh, dgates, wd)
    db_ref[:, :] += jnp.sum(dgates, axis=0, keepdims=True)
    dxp_ref[:, :] = dxh[:, :emb_dim]

    sdh[:] = dxh[:, emb_dim:] + dh_head
    sdc[:] = dc_prev
    # after the earliest step, the carry is the cotangent of (ph1, pc1)
    dph1_ref[:, :] = sdh[:]
    dpc1_ref[:, :] = sdc[:]


def _value_bwd_kernel(
    *refs, hidden: int, tape_gates: bool,
):
    f32 = jnp.float32
    if tape_gates:
        (dval_ref, feats_ref, hv_ref, cv_ref, gv_ref, tok_ref,
         v_emb_ref, v_w_ref, v_w1_ref, v_b1_ref, v_w2_ref,
         dxv_ref, dfeat_ref, dvh1_ref, dvc1_ref,
         dw_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
         sdh, sdc) = refs
    else:
        (dval_ref, feats_ref, hv_ref, cv_ref, tok_ref,
         v_emb_ref, v_w_ref, v_b_ref, v_w1_ref, v_b1_ref, v_w2_ref,
         dxv_ref, dfeat_ref, dvh1_ref, dvc1_ref,
         dw_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
         sdh, sdc) = refs
    i_t = pl.program_id(0)
    s = pl.program_id(1)
    bn = hv_ref.shape[0]
    feat_dim = feats_ref.shape[1]

    @pl.when(s == 0)
    def _init_carry():
        sdh[:] = jnp.zeros_like(sdh)
        sdc[:] = jnp.zeros_like(sdc)
        # per-tile features cotangent accumulates in VMEM (the block is
        # revisited across the step axis, flushed once per tile)
        dfeat_ref[:, :] = jnp.zeros_like(dfeat_ref)

    @pl.when(jnp.logical_and(i_t == 0, s == 0))
    def _init_accums():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2_ref[:, :] = jnp.zeros_like(dw2_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)

    h_v = hv_ref[:]
    wd = v_w1_ref.dtype
    # value head backward: recompute v1, pad the scalar cotangent to col 0
    fh = jnp.concatenate([feats_ref[:], h_v], axis=1)
    v1 = jnp.dot(fh.astype(wd), v_w1_ref[:], preferred_element_type=f32) + v_b1_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, 128), 1)
    dvb = dval_ref[:] * (col == 0).astype(f32)  # [bn, 128], col 0 real
    dw2_ref[:, :] += _outer(v1, dvb, wd)
    db2_ref[:, :] += jnp.sum(dvb, axis=0, keepdims=True)
    dv1 = jax.lax.dot_general(
        dvb.astype(wd), v_w2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # [bn, H]
    dw1_ref[:, :] += _outer(fh, dv1, wd)
    db1_ref[:, :] += jnp.sum(dv1, axis=0, keepdims=True)
    dfh = jax.lax.dot_general(
        dv1.astype(wd), v_w1_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # [bn, F+H]
    dfeat_ref[:, :] += dfh[:, :feat_dim]
    dh_head = dfh[:, feat_dim:]

    vp = v_emb_ref.shape[0]
    col_v = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
    x_v = jnp.dot((col_v == tok_ref[:]).astype(wd), v_emb_ref[:],
                  preferred_element_type=f32)
    emb_dim = x_v.shape[1]
    xh = jnp.concatenate([x_v, h_v], axis=1)
    if tape_gates:
        gates = gv_ref[:]
    else:
        gi, gf, gg, go = _lstm_gates(xh, v_w_ref[:], v_b_ref[:], hidden)
        gates = jnp.concatenate([gi, gf, gg, go], axis=1)
    dgates, dxh, dc_prev = _cell_bwd(sdh[:], sdc[:], gates, cv_ref[:], v_w_ref, hidden)
    dw_ref[:, :] += _outer(xh, dgates, wd)
    db_ref[:, :] += jnp.sum(dgates, axis=0, keepdims=True)
    dxv_ref[:, :] = dxh[:, :emb_dim]

    sdh[:] = dxh[:, emb_dim:] + dh_head
    sdc[:] = dc_prev
    dvh1_ref[:, :] = sdh[:]
    dvc1_ref[:, :] = sdc[:]


def _policy_bwd_pallas(
    dlogp_sm, hp, cp, gp, act_sm, tok_sm, p_emb, p_w, p_b, p_hw, p_hb,
    *, steps: int, bn: int, hidden: int, emb_dim: int, interpret: bool,
):
    """``gp=None`` selects the gate-recompute variant (no gate tape);
    ``p_b`` is only read in that variant."""
    n_pad = hp.shape[0] // steps
    vp = p_hw.shape[1]
    tiles = n_pad // bn
    grid = (tiles, steps)
    f32 = jnp.float32
    tape_gates = gp is not None

    # reverse-time streams: grid step s touches real step steps-1-s
    vm, tile, whole, _, rev = _specs(bn, tiles, steps)

    in_specs = [
        vm((bn, 1), rev),             # dlogp
        vm((bn, hidden), rev),        # h_p (entering)
        vm((bn, hidden), rev),        # c_p (entering)
    ]
    operands = [dlogp_sm, hp, cp]
    if tape_gates:
        in_specs.append(vm((bn, 4 * hidden), rev))   # gates
        operands.append(gp)
    in_specs += [
        vm((bn, 1), rev),             # actions
        vm((bn, 1), rev),             # placed tokens
        vm((vp, emb_dim), whole),     # embedding (x recompute)
        vm((emb_dim + hidden, 4 * hidden), whole),
    ]
    operands += [act_sm, tok_sm, p_emb, p_w]
    if not tape_gates:
        in_specs.append(vm((1, 4 * hidden), whole))  # cell bias (recompute)
        operands.append(p_b)
    in_specs += [vm((hidden, vp), whole), vm((1, vp), whole)]
    operands += [p_hw, p_hb]

    return pl.pallas_call(
        functools.partial(_policy_bwd_kernel, hidden=hidden, tape_gates=tape_gates),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            vm((bn, emb_dim), rev),       # dx_p stream (real-step order)
            vm((bn, hidden), tile), vm((bn, hidden), tile),  # d(ph1), d(pc1)
            vm((emb_dim + hidden, 4 * hidden), whole), vm((1, 4 * hidden), whole),
            vm((hidden, vp), whole), vm((1, vp), whole),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((steps * n_pad, emb_dim), f32),
            jax.ShapeDtypeStruct((n_pad, hidden), f32),
            jax.ShapeDtypeStruct((n_pad, hidden), f32),
            jax.ShapeDtypeStruct((emb_dim + hidden, 4 * hidden), f32),
            jax.ShapeDtypeStruct((1, 4 * hidden), f32),
            jax.ShapeDtypeStruct((hidden, vp), f32),
            jax.ShapeDtypeStruct((1, vp), f32),
        ),
        scratch_shapes=[pltpu.VMEM((bn, hidden), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*operands)


def _value_bwd_pallas(
    dval_sm, feats, hv, cv, gv, tok_sm, v_emb, v_w, v_b, v_w1, v_b1, v_w2,
    *, steps: int, bn: int, hidden: int, emb_dim: int, vp: int, interpret: bool,
):
    """``gv=None`` selects the gate-recompute variant; ``v_b`` is only
    read in that variant."""
    n_pad, feat_dim = feats.shape
    tiles = n_pad // bn
    grid = (tiles, steps)
    f32 = jnp.float32
    tape_gates = gv is not None

    vm, tile, whole, _, rev = _specs(bn, tiles, steps)

    in_specs = [
        vm((bn, 1), rev),             # dvalue
        vm((bn, feat_dim), tile),     # features
        vm((bn, hidden), rev),        # h_v (entering)
        vm((bn, hidden), rev),        # c_v (entering)
    ]
    operands = [dval_sm, feats, hv, cv]
    if tape_gates:
        in_specs.append(vm((bn, 4 * hidden), rev))   # gates
        operands.append(gv)
    in_specs += [
        vm((bn, 1), rev),             # placed tokens
        vm((vp, emb_dim), whole),     # embedding (x recompute)
        vm((emb_dim + hidden, 4 * hidden), whole),
    ]
    operands += [tok_sm, v_emb, v_w]
    if not tape_gates:
        in_specs.append(vm((1, 4 * hidden), whole))  # cell bias (recompute)
        operands.append(v_b)
    in_specs += [
        vm((feat_dim + hidden, hidden), whole), vm((1, hidden), whole),
        vm((hidden, 128), whole),
    ]
    operands += [v_w1, v_b1, v_w2]

    return pl.pallas_call(
        functools.partial(_value_bwd_kernel, hidden=hidden, tape_gates=tape_gates),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            vm((bn, emb_dim), rev),       # dx_v stream
            vm((bn, feat_dim), tile),     # dfeat, accumulated per tile
            vm((bn, hidden), tile), vm((bn, hidden), tile),  # d(vh1), d(vc1)
            vm((emb_dim + hidden, 4 * hidden), whole), vm((1, 4 * hidden), whole),
            vm((feat_dim + hidden, hidden), whole), vm((1, hidden), whole),
            vm((hidden, 128), whole), vm((1, 128), whole),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((steps * n_pad, emb_dim), f32),
            jax.ShapeDtypeStruct((n_pad, feat_dim), f32),
            jax.ShapeDtypeStruct((n_pad, hidden), f32),
            jax.ShapeDtypeStruct((n_pad, hidden), f32),
            jax.ShapeDtypeStruct((emb_dim + hidden, 4 * hidden), f32),
            jax.ShapeDtypeStruct((1, 4 * hidden), f32),
            jax.ShapeDtypeStruct((feat_dim + hidden, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((hidden, 128), f32),
            jax.ShapeDtypeStruct((1, 128), f32),
        ),
        scratch_shapes=[pltpu.VMEM((bn, hidden), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*operands)


@functools.lru_cache(maxsize=None)
def _make_core(steps: int, bn: int, hidden: int, emb_dim: int, vp: int,
               weight_dtype_name: str, interpret: bool,
               tape_dtype_name: str = "float32",
               fuse_reward: bool = False, tape_gates: bool = True):
    """Factory: the custom-VJP'd rollout core for one static shape set.

    The core's array arguments are the PADDED weight forms (built in
    plain JAX by the public wrapper so pad/concat cotangents un-do
    themselves under autodiff); bf16 casting happens inside, and the
    hand-written backward returns f32 cotangents for every float input.

    ``fuse_reward`` appends the 9 frozen-reward operands to the core's
    arguments and a rewards array to its outputs (forward-only: the
    reward net is frozen + stop-gradient, Q7, so its operands get zero
    cotangents). ``tape_gates=False`` drops the gate tape; the backward
    kernels recompute gates from the (h, c) tape (round-3 A/B).
    """
    wd = jnp.bfloat16 if weight_dtype_name == "bfloat16" else jnp.float32
    td = jnp.bfloat16 if tape_dtype_name == "bfloat16" else jnp.float32
    f32 = jnp.float32
    n_rew = 9 if fuse_reward else 0

    def _run_fwd(curr, feats, ph1, pc1, vh1, vc1, teach_sm, gumbel_sm,
                 p_emb, p_w, p_b, p_hw, p_hb,
                 v_emb, v_w, v_b, v_w1, v_b1, v_w2, v_b2, *rew_ops):
        reward_operands = None
        if fuse_reward:
            (rew0, vn, r_emb, r_wi, r_wh, r_bi, r_bh, sem_w, sem_b) = rew_ops
            reward_operands = (
                rew0.astype(f32), vn.astype(f32), r_emb.astype(wd),
                r_wi.astype(wd), r_wh.astype(wd), r_bi.astype(f32),
                r_bh.astype(f32), sem_w.astype(wd), sem_b.astype(f32),
            )
        return _fwd_pallas(
            curr, feats, ph1, pc1, vh1, vc1, teach_sm, gumbel_sm,
            p_emb.astype(wd), p_w.astype(wd), p_b.astype(f32),
            p_hw.astype(wd), p_hb.astype(f32),
            v_emb.astype(wd), v_w.astype(wd), v_b.astype(f32),
            v_w1.astype(wd), v_b1.astype(f32), v_w2.astype(wd), v_b2.astype(f32),
            steps=steps, bn=bn, hidden=hidden, interpret=interpret, tape_dtype=td,
            reward_operands=reward_operands, tape_gates=tape_gates,
        )

    def _split_outs(outs):
        """-> (primals, tape) where primals = (values, logps, actions,
        tokens[, rewards]) and tape = (hp, cp, gp?, hv, cv, gv?)."""
        values, logps, actions, tokens = outs[:4]
        pos = 4
        n_tape = 6 if tape_gates else 4
        tape = outs[pos : pos + n_tape]
        pos += n_tape
        primals = (values, logps, actions, tokens)
        if fuse_reward:
            primals = primals + (outs[pos],)
        return primals, tape

    @jax.custom_vjp
    def core(*args):
        primals, _ = _split_outs(_run_fwd(*args))
        return primals

    def core_fwd(*args):
        (curr, feats, ph1, pc1, vh1, vc1, teach_sm, gumbel_sm,
         p_emb, p_w, p_b, p_hw, p_hb,
         v_emb, v_w, v_b, v_w1, v_b1, v_w2, v_b2) = args[:20]
        primals, tape = _split_outs(_run_fwd(*args))
        actions, tokens = primals[2], primals[3]
        if tape_gates:
            hp, cp, gp, hv, cv, gv = tape
        else:
            hp, cp, hv, cv = tape
            gp = gv = None
        res = (feats, actions, tokens, hp, cp, gp, hv, cv, gv,
               p_emb.astype(wd), p_w.astype(wd), p_b.astype(f32),
               p_hw.astype(wd), p_hb.astype(f32),
               v_emb.astype(wd), v_w.astype(wd), v_b.astype(f32),
               v_w1.astype(wd), v_b1.astype(f32), v_w2.astype(wd))
        return primals, res

    def core_bwd(res, cots):
        import numpy as np

        (feats, act_sm, tok_sm, hp, cp, gp, hv, cv, gv,
         p_emb_c, p_w_c, p_b_c, p_hw_c, p_hb_c,
         v_emb_c, v_w_c, v_b_c, v_w1_c, v_b1_c, v_w2_c) = res
        dvalues, dlogps = cots[0], cots[1]  # ints/rewards carry no gradient

        (dxp, dph1, dpc1, dpw, dpb, dphw, dphb) = _policy_bwd_pallas(
            dlogps, hp, cp, gp, act_sm, tok_sm, p_emb_c, p_w_c, p_b_c,
            p_hw_c, p_hb_c,
            steps=steps, bn=bn, hidden=hidden, emb_dim=emb_dim, interpret=interpret,
        )
        (dxv, dfeats, dvh1, dvc1, dvw, dvb, dvw1, dvb1, dvw2, dvb2) = _value_bwd_pallas(
            dvalues, feats, hv, cv, gv, tok_sm, v_emb_c, v_w_c, v_b_c,
            v_w1_c, v_b1_c, v_w2_c,
            steps=steps, bn=bn, hidden=hidden, emb_dim=emb_dim, vp=vp, interpret=interpret,
        )
        # embedding-table scatter: tokens drove both encoders' inputs
        tok_flat = tok_sm[:, 0]
        dp_emb = jax.ops.segment_sum(dxp, tok_flat, num_segments=vp)
        dv_emb = jax.ops.segment_sum(dxv, tok_flat, num_segments=vp)
        # features cotangent accumulated inside the value backward kernel
        n_pad = feats.shape[0]

        fz = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731 int args
        grads = (
            fz(jnp.zeros((1, 1), jnp.int32)),      # curr
            dfeats,                                  # feats
            dph1, dpc1, dvh1, dvc1,                  # initial states
            fz(tok_sm),                              # teachers (int)
            jnp.zeros((steps * n_pad, vp), f32),     # gumbel (no grad path)
            dp_emb, dpw, dpb, dphw, dphb,
            dv_emb, dvw, dvb, dvw1, dvb1, dvw2, dvb2,
        )
        if fuse_reward:
            # frozen reward operands: zero cotangents (Q7 stop-gradient)
            grads = grads + (
                jnp.zeros((n_pad, hidden), f32),       # rew0
                jnp.zeros((n_pad, hidden), f32),       # vn
                jnp.zeros((vp, emb_dim), f32),         # r_emb
                jnp.zeros((emb_dim, 3 * hidden), f32),  # r_wi
                jnp.zeros((hidden, 3 * hidden), f32),   # r_wh
                jnp.zeros((1, 3 * hidden), f32),        # r_bi
                jnp.zeros((1, 3 * hidden), f32),        # r_bh
                jnp.zeros((hidden, hidden), f32),       # sem_w
                jnp.zeros((1, hidden), f32),            # sem_b
            )
        return grads

    core.defvjp(core_fwd, core_bwd)
    return core


def fused_rollout(
    a2c_params: dict,
    cfg,
    features: jax.Array,
    captions: jax.Array,
    curr_seq_len: jax.Array,
    rng: jax.Array,
    block_n: int = 128,
    weight_dtype=jnp.bfloat16,
    interpret: bool = False,
    tape_dtype=None,
    reward_params: dict = None,
    tape_gates: bool = True,
):
    """Fused policy+value rollout; drop-in core of ``a2c_rollout_loss``.

    Returns ``(values [N, S], log_probs [N, S], actions [N, S],
    token_in [N, S])`` with S = max_seq_len - 1, differentiable wrt the
    policy/value parameters through the hand-written Pallas VJP. The
    frozen reward stream is computed by the caller from ``actions`` /
    ``token_in`` (see ``train.steps.a2c_rollout_loss_fused``) — unless
    ``reward_params`` is given, in which case the reward GRU stream runs
    INSIDE the rollout kernel (one program instead of two; Q7
    stop-gradient by construction) and a fifth array ``rewards [N, S]``
    is returned. ``tape_gates=False`` drops the gate-activation tape
    (2/3 of tape bytes); the backward recomputes gates instead.
    """
    from ..models import policy as policy_mod
    from ..models import reward as reward_mod
    from ..models import value as value_mod
    from ..ops.linalg import dense
    from ..ops.rnn import gru_cell, lstm_cell

    pparams, vparams = a2c_params["policy"], a2c_params["value"]
    if "lstm" not in pparams or "lstm" not in vparams:
        raise ValueError("fused rollout requires unidirectional networks")
    if (vparams["embedding"].shape != pparams["embedding"].shape
            or vparams["lstm"]["wh"].shape != pparams["lstm"]["wh"].shape):
        # the BlockSpecs below size the value (and reward) blocks from
        # the policy's dims; mismatched nets (e.g. a pretrained 300-d
        # policy embedding with a 512-d value net) must fail fast with a
        # readable error, not crash inside pallas_call
        raise ValueError(
            "fused rollout requires policy and value networks with "
            "matching embedding/hidden dims "
            f"(policy {pparams['embedding'].shape}/"
            f"{pparams['lstm']['wh'].shape}, "
            f"value {vparams['embedding'].shape}/"
            f"{vparams['lstm']['wh'].shape})"
        )
    if reward_params is not None and (
            reward_params["embedding"].shape != pparams["embedding"].shape
            or reward_params["gru"]["wh"].shape[0]
            != pparams["lstm"]["wh"].shape[0]):
        raise ValueError(
            "in-kernel reward stream requires a reward net matching the "
            "policy's embedding/hidden dims "
            f"(policy {pparams['embedding'].shape}, "
            f"reward {reward_params['embedding'].shape})"
        )
    n, t_max = captions.shape
    steps = t_max - 1
    hidden = cfg.hidden_dim
    vocab, emb_dim = pparams["embedding"].shape
    vp = _round_up(vocab, 128)
    # adaptive tile size: small batches take small tiles. (The old
    # single-tile clamp to bn=32 guarded the 16 MiB default scoped-VMEM
    # budget; with _VMEM_LIMIT=64 MiB a single 128-row tile fits —
    # verified on v5e.)
    block_n = min(block_n, max(8, _round_up(n, 8)))
    n_pad = _round_up(n, block_n)
    f32 = jnp.float32

    # init states in plain JAX (autodiff backprops them into cnn2linear
    # and the start-token embedding rows through the core's cotangents)
    start = captions[:, 0]
    pol_state = policy_mod.init_decode_state(pparams, cfg, features)
    ph1, pc1 = lstm_cell(pparams["lstm"], pparams["embedding"][start], pol_state,
                         precision=cfg.precision)
    vh1, vc1 = value_mod.rnn_step(vparams, cfg, start, value_mod.zero_rnn_state(cfg, n))

    # Gumbel noise with jax.random.categorical's exact keys/shapes
    step_keys = jax.random.split(rng, steps)
    gumbel = jax.vmap(lambda k: jax.random.gumbel(k, (n, vocab), f32))(step_keys)

    pad_rows = lambda x: _pad_rows(x, n_pad)  # noqa: E731

    feats_p = pad_rows(features.astype(f32))
    ph1, pc1, vh1, vc1 = (pad_rows(x) for x in (ph1, pc1, vh1, vc1))
    gum_p = jnp.zeros((steps, n_pad, vp), f32).at[:, :n, :vocab].set(gumbel)
    gum_sm = gum_p.reshape(steps * n_pad, vp)
    teach = pad_rows(captions[:, 1:].astype(jnp.int32))
    teach_sm = jnp.swapaxes(teach, 0, 1).reshape(steps * n_pad, 1)
    curr = jnp.full((1, 1), curr_seq_len, jnp.int32)

    # padded weight forms via pad/concatenate (their transposes are
    # slices, so the cotangents un-pad themselves; .at[].set scalar
    # scatters break under JAX's transpose rule)
    def pad_emb(e):
        return jnp.pad(e.astype(f32), ((0, vp - vocab), (0, 0)))

    p_w = jnp.concatenate([pparams["lstm"]["wi"], pparams["lstm"]["wh"]], axis=0)
    v_w = jnp.concatenate([vparams["lstm"]["wi"], vparams["lstm"]["wh"]], axis=0)
    p_hw = jnp.pad(pparams["head"]["w"], ((0, 0), (0, vp - vocab)))
    p_hb = jnp.concatenate(
        [pparams["head"]["b"][None, :], jnp.full((1, vp - vocab), _NEG, f32)], axis=1
    )
    v_w2 = jnp.pad(vparams["linear2"]["w"], ((0, 0), (0, 127)))
    v_b2 = jnp.pad(vparams["linear2"]["b"][None, :], ((0, 0), (0, 127)))

    # tape dtype default f32: a measured A/B at COCO shapes (v5e, scan-
    # amortized dispatch) put the bf16 tape at 2.32 ms vs 2.26 ms f32
    # per fwd+bwd — the cast/relayout cost outweighs the bandwidth win
    # at 512-wide streams — and f32 keeps the hand-written VJP in the
    # same rounding class as jax.grad of the XLA rollout.
    fuse_reward = reward_params is not None
    core = _make_core(
        steps, block_n, hidden, emb_dim, vp,
        jnp.dtype(weight_dtype).name, interpret,
        jnp.dtype(tape_dtype if tape_dtype is not None else jnp.float32).name,
        fuse_reward, tape_gates,
    )
    operands = (
        curr, feats_p, ph1, pc1, vh1, vc1, teach_sm, gum_sm,
        pad_emb(pparams["embedding"]), p_w, pparams["lstm"]["b"][None, :],
        p_hw, p_hb,
        pad_emb(vparams["embedding"]), v_w, vparams["lstm"]["b"][None, :],
        vparams["linear1"]["w"], vparams["linear1"]["b"][None, :], v_w2, v_b2,
    )
    if fuse_reward:
        # per-episode constants of the frozen reward stream, precomputed
        # in XLA exactly as fused_reward_stream does
        rew0 = gru_cell(
            reward_params["gru"], reward_params["embedding"][start],
            reward_mod.zero_rnn_state(cfg, n), precision=cfg.precision,
        )
        ve = dense(features, reward_params["visual_embed"], precision=cfg.precision)
        vn = ve / jnp.maximum(jnp.linalg.norm(ve, axis=-1, keepdims=True), 1e-12)
        rg = reward_params["gru"]
        operands = operands + tuple(
            jax.lax.stop_gradient(x) for x in (
                pad_rows(rew0.astype(f32)), pad_rows(vn.astype(f32)),
                pad_emb(reward_params["embedding"]),
                rg["wi"], rg["wh"], rg["bi"][None, :], rg["bh"][None, :],
                reward_params["semantic_embed"]["w"],
                reward_params["semantic_embed"]["b"][None, :],
            )
        )

    outs = core(*operands)

    def unstream(x, dt):  # [S*n_pad, 1] -> [N, S]
        return jnp.swapaxes(x.reshape(steps, n_pad), 0, 1)[:n].astype(dt)

    result = (
        unstream(outs[0], f32),
        unstream(outs[1], f32),
        unstream(outs[2], jnp.int32),
        unstream(outs[3], jnp.int32),
    )
    if fuse_reward:
        result = result + (jax.lax.stop_gradient(unstream(outs[4], f32)),)
    return result


# ---------------------------------------------------------------------------
# Frozen reward stream (forward-only: the reward is stop-gradient, Q7)
# ---------------------------------------------------------------------------

def _reward_stream_kernel(
    act_ref, tok_ref, rew0_ref, vn_ref,
    r_emb_ref, r_wi_ref, r_wh_ref, r_bi_ref, r_bh_ref, sem_w_ref, sem_b_ref,
    rew_ref,
    sh,
    *, hidden: int,
):
    f32 = jnp.float32
    s = pl.program_id(1)
    bn = rew0_ref.shape[0]
    vp = r_emb_ref.shape[0]
    wd = r_emb_ref.dtype

    @pl.when(s == 0)
    def _init():
        sh[:] = rew0_ref[:]

    col_v = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)

    def gru(tok, h):
        return _gru_step(tok, h, col_v, r_emb_ref, r_wi_ref, r_wh_ref,
                         r_bi_ref, r_bh_ref, hidden)

    h = sh[:]
    # lookahead: reward of prefix + sampled action (trainers.py:459)
    after = gru(act_ref[:], h)
    se = jnp.dot(after.astype(wd), sem_w_ref[:], preferred_element_type=f32) + sem_b_ref[:]
    sn = jnp.sqrt(jnp.sum(se * se, axis=-1, keepdims=True))
    rew_ref[:, :] = jnp.sum(vn_ref[:] * se, axis=-1, keepdims=True) / jnp.maximum(sn, 1e-12)
    # advance with the token actually placed
    sh[:] = gru(tok_ref[:], h)


def fused_reward_stream(
    reward_params: dict,
    cfg,
    features: jax.Array,
    start_tokens: jax.Array,
    actions: jax.Array,
    tokens: jax.Array,
    block_n: int = 128,
    weight_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """The A2C rollout's frozen embedding-reward stream as one kernel.

    Per step: GRU lookahead on the sampled action, semantic embed,
    cosine against the (precomputed, normalized) visual embedding, then
    the GRU advances with the placed token — mirroring the XLA scan in
    ``train.steps.a2c_rollout_loss_fused``. Forward-only by design: the
    reward network is frozen and its output stop-gradient'ed
    (trainers.py:372-373, Q7), so no tape or VJP exists.
    ``actions``/``tokens``: ``[N, S]`` from :func:`fused_rollout`.
    Returns ``rewards [N, S]``.
    """
    from ..ops.linalg import dense
    from ..ops.rnn import gru_cell
    from ..models import reward as reward_mod

    n, s_steps = actions.shape
    hidden = cfg.hidden_dim
    vocab, emb_dim = reward_params["embedding"].shape
    vp = _round_up(vocab, 128)
    block_n = min(block_n, max(8, _round_up(n, 8)))
    n_pad = _round_up(n, block_n)
    tiles = n_pad // block_n
    f32 = jnp.float32
    wd = weight_dtype

    pad_rows = lambda x: _pad_rows(x, n_pad)  # noqa: E731

    # XLA-side pre-computation: the start-token cell and the normalized
    # visual embedding are per-episode constants
    rew0 = gru_cell(
        reward_params["gru"], reward_params["embedding"][start_tokens],
        reward_mod.zero_rnn_state(cfg, n), precision=cfg.precision,
    )
    ve = dense(features, reward_params["visual_embed"], precision=cfg.precision)
    vn = ve / jnp.maximum(jnp.linalg.norm(ve, axis=-1, keepdims=True), 1e-12)

    sm = lambda x: jnp.swapaxes(pad_rows(x.astype(jnp.int32)), 0, 1).reshape(  # noqa: E731
        s_steps * n_pad, 1)
    act_sm, tok_sm = sm(actions), sm(tokens)

    vm, tile, whole, stream, _ = _specs(block_n, tiles, s_steps)

    gp = reward_params["gru"]
    emb_pad = jnp.pad(reward_params["embedding"].astype(wd), ((0, vp - vocab), (0, 0)))
    rewards = pl.pallas_call(
        functools.partial(_reward_stream_kernel, hidden=hidden),
        grid=(tiles, s_steps),
        in_specs=[
            vm((block_n, 1), stream), vm((block_n, 1), stream),
            vm((block_n, hidden), tile), vm((block_n, hidden), tile),
            vm((vp, emb_dim), whole),
            vm((emb_dim, 3 * hidden), whole), vm((hidden, 3 * hidden), whole),
            vm((1, 3 * hidden), whole), vm((1, 3 * hidden), whole),
            vm((hidden, hidden), whole), vm((1, hidden), whole),
        ],
        out_specs=vm((block_n, 1), stream),
        out_shape=jax.ShapeDtypeStruct((s_steps * n_pad, 1), f32),
        scratch_shapes=[pltpu.VMEM((block_n, hidden), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(
        act_sm, tok_sm, pad_rows(rew0.astype(f32)), pad_rows(vn.astype(f32)),
        emb_pad, gp["wi"].astype(wd), gp["wh"].astype(wd),
        gp["bi"].astype(f32)[None, :], gp["bh"].astype(f32)[None, :],
        reward_params["semantic_embed"]["w"].astype(wd),
        reward_params["semantic_embed"]["b"].astype(f32)[None, :],
    )
    return jax.lax.stop_gradient(
        jnp.swapaxes(rewards.reshape(s_steps, n_pad), 0, 1)[:n]
    )

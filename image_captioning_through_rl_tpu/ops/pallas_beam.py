"""Fused value-guided beam-search Pallas TPU kernel.

The eval hot loop (reference trainers.py:73-105, ~480 RNN forwards per
127-image slice) as a single on-core program: per beam step, the policy
cell + vocab head, top-k expansion, B^2 critic cells + scoring, and the
beam selection/reordering all run from VMEM-resident weights.

Vectorization strategy (per batch tile of ``bn`` images):

  * candidates advance as one ``[bn*B]`` row block through the policy
    cell; expansions as ``[bn*B*B]`` rows through the critic cell;
  * top-k over the vocab and top-B over the B^2 candidate scores are
    k/B rounds of (arg)max-and-mask — tiny on the VPU, and avoids
    relying on general sorts inside Mosaic;
  * beam reordering (states, accumulated scores, token history) is a
    one-hot selection matmul — gathers across lanes don't vectorize,
    but ``[bn*B, B^2] @ [bn*B^2, X]`` block-diagonal selection does.
    Token histories ride through the f32 MXU (token ids < 2^24 are
    exact in f32);
  * per-sample beams with log-softmax scoring (the framework's default
    decode mode; the faithful batch-mean mode stays on the XLA path).

Layouts: histories are time-major ``[T, bn*B]``; per-row scalars are
``[rows, 1]`` so reductions stay in-lane.

STATUS: experimental. Token-exact against the XLA beam
(:func:`..decode.beam.beam_search`) under the Pallas interpreter
(tests/test_pallas_beam.py). The Mosaic compile crashes on this
kernel's arbitrary 3D relayouts — bisected to ``jnp.transpose`` of
``reshape``d 3D values (e.g. ``[T, bn, B] -> [bn, B, T]``), which the
TPU lowering does not support; the fix is a redesign that keeps every
intermediate in a 2D ``[rows, lanes]`` layout and performs all beam
reorderings as matmuls. Until then the production eval path remains the
XLA beam (10.4 ms per 127-image slice, benchmarks/BENCHMARKS.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import _round_up

_NEG = -1e30


def _lstm_gates(x, h, wi, wh, b, hidden):
    f32 = jnp.float32
    gates = (
        jnp.dot(x, wi, preferred_element_type=f32)
        + jnp.dot(h.astype(wi.dtype), wh, preferred_element_type=f32)
        + b
    )
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])
    return i, f, g, o


def _topk_maxmask(scores, k):
    """k rounds of (max, argmax, mask): values+indices, sorted desc.

    scores: [rows, C] -> (vals [rows, k], onehots [k, rows, C])
    """
    rows, c = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, c), 1)
    vals = []
    hots = []
    cur = scores
    for _ in range(k):
        m = jnp.max(cur, axis=1, keepdims=True)  # [rows, 1]
        is_max = (cur == m)
        # break ties toward the smallest column index (torch.topk order)
        first_col = jnp.min(jnp.where(is_max, col, c), axis=1, keepdims=True)
        hot = (col == first_col).astype(jnp.float32)
        vals.append(m)
        hots.append(hot)
        cur = jnp.where(hot > 0, _NEG, cur)
    return jnp.concatenate(vals, axis=1), hots


def _beam_kernel(
    feats_ref, start_ref,
    p_wc_ref, p_bc_ref, p_emb_ref, p_wi_ref, p_wh_ref, p_b_ref, p_wo_ref, p_bo_ref,
    v_emb_ref, v_wi_ref, v_wh_ref, v_b_ref, v_w1_ref, v_b1_ref, v_w2_ref, v_b2_ref,
    out_tokens_ref, out_scores_ref,
    *, steps: int, beam: int, vw: float, lw: float,
):
    f32 = jnp.float32
    bn = feats_ref.shape[0]
    vp = p_emb_ref.shape[0]
    hidden = p_wh_ref.shape[0]
    nb = bn * beam
    nbb = bn * beam * beam
    wd = p_emb_ref.dtype

    def body(hist, pol_h, pol_c, val_h, val_c, scores):

        # --- init: all beams hold <START>; only beam 0 is live --------------
        start = start_ref[:, 0:1]  # [bn, 1]
        hist[0:1, :] = jnp.broadcast_to(start, (bn, beam)).reshape(1, nb)

        h0 = jnp.dot(feats_ref[:], p_wc_ref[:], preferred_element_type=f32) + p_bc_ref[:]
        col_v = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
        emb0 = jnp.dot(
            (col_v == start).astype(wd), p_emb_ref[:],
            preferred_element_type=f32,
        )
        i, f, g, o = _lstm_gates(emb0, h0, p_wi_ref[:], p_wh_ref[:], p_b_ref[:], hidden)
        c1 = i * g  # c0 = 0
        h1 = o * jnp.tanh(c1)
        pol_h[:] = jnp.broadcast_to(h1[:, None, :], (bn, beam, hidden)).reshape(nb, hidden)
        pol_c[:] = jnp.broadcast_to(c1[:, None, :], (bn, beam, hidden)).reshape(nb, hidden)

        vemb0 = jnp.dot(
            (col_v == start).astype(wd), v_emb_ref[:],
            preferred_element_type=f32,
        )
        vi, vf, vg, vo = _lstm_gates(
            vemb0, jnp.zeros((bn, hidden), f32), v_wi_ref[:], v_wh_ref[:], v_b_ref[:], hidden
        )
        vc1 = vi * vg
        vh1 = vo * jnp.tanh(vc1)
        val_h[:] = jnp.broadcast_to(vh1[:, None, :], (bn, beam, hidden)).reshape(nb, hidden)
        val_c[:] = jnp.broadcast_to(vc1[:, None, :], (bn, beam, hidden)).reshape(nb, hidden)

        beam_col = jax.lax.broadcasted_iota(jnp.int32, (bn, beam), 1)
        scores[:] = jnp.where(beam_col == 0, 0.0, -_NEG).astype(f32)  # +inf clones

        col_vb = jax.lax.broadcasted_iota(jnp.int32, (nb, vp), 1)
        col_vbb = jax.lax.broadcasted_iota(jnp.int32, (nbb, vp), 1)

        def step_fn(t, _):
            # 1) policy logits for every candidate
            logits = (
                jnp.dot(pol_h[:].astype(wd), p_wo_ref[:], preferred_element_type=f32)
                + p_bo_ref[:]
            )  # [nb, vp]
            lse = jax.nn.logsumexp(logits, axis=1, keepdims=True)

            # 2) per-candidate top-B expansions
            topv, hots = _topk_maxmask(logits, beam)  # [nb, beam], beam x [nb, vp]
            logp = topv - lse  # [nb, beam] log-softmax at the top tokens

            # expansion token ids, via iota dot: [beam, nb]
            tok_ids = jnp.stack(
                [jnp.sum(h * col_vb.astype(f32), axis=1) for h in hots], axis=0
            )  # f32, exact for ids < 2^24

            # 3) critic on each expansion: one [nbb] cell step
            emb_exp = jnp.concatenate(
                [jnp.dot(h.astype(wd), v_emb_ref[:], preferred_element_type=f32)
                 for h in hots], axis=0,
            )  # [beam*nb, E] grouped expansion-major
            vh_rep = jnp.concatenate([val_h[:]] * beam, axis=0).astype(wd)
            vc_rep = jnp.concatenate([val_c[:]] * beam, axis=0).astype(wd)
            vi, vf, vg, vo = _lstm_gates(
                emb_exp.astype(wd), vh_rep, v_wi_ref[:], v_wh_ref[:], v_b_ref[:], hidden
            )
            vc_new = vf * vc_rep.astype(f32) + vi * vg
            vh_new = vo * jnp.tanh(vc_new)  # [beam*nb, H] f32

            # features per row (n-major within nb, expansion-major outer)
            feats_nb = jnp.broadcast_to(
                feats_ref[:][:, None, :], (bn, beam, feats_ref.shape[1])
            ).reshape(nb, -1)
            feats_rep = jnp.concatenate([feats_nb] * beam, axis=0)  # [beam*nb, F]
            state_cat = jnp.concatenate([feats_rep, vh_new], axis=1)
            v1 = jnp.dot(state_cat.astype(wd), v_w1_ref[:], preferred_element_type=f32) + v_b1_ref[:]
            value = (
                jnp.dot(v1.astype(wd), v_w2_ref[:], preferred_element_type=f32) + v_b2_ref[:]
            )[:, 0]  # [beam*nb]

            # 4) accumulate scores: cand[e, n, p] for expansion e of parent p
            # (rows of value are [e, n, p]: expansion-major outer, n-major inner)
            value_e = value.reshape(beam, bn, beam)  # [e, n, p]
            logp_e = jnp.transpose(logp.reshape(bn, beam, beam), (2, 0, 1))  # [e, n, p]
            delta = vw * value_e + lw * logp_e
            cand = scores[:].reshape(1, bn, beam) - delta  # [e, n, p]
            cand_flat = jnp.transpose(cand, (1, 2, 0)).reshape(bn, beam * beam)
            # flat index j = p*beam + e  (parent-major, matching reshape below)

            # 5) keep the B smallest per sample
            negv, sel_hots = _topk_maxmask(-cand_flat, beam)  # hots: beam x [bn, beam*beam]
            scores[:] = -negv

            sel = jnp.stack(sel_hots, axis=0)  # [k, bn, beam*beam] one-hot f32

            # 6) reorder beam state under the selection (one-hot matmuls)
            # parent weights: [k, bn, beam] ; expansion weights: [k, bn, beam]
            sel_pb = sel.reshape(beam, bn, beam, beam)  # [k, bn, parent, exp]

            w_parent = jnp.sum(sel_pb, axis=3)  # [k, bn, parent]

            def mix_parent(x_nb):  # [nb, X] -> [nb, X] selected by parent
                # out[n, k, :] = sum_p w[k, n, p] * x[n, p, :]
                x = x_nb.reshape(bn, beam, -1)
                outs = []
                for k in range(beam):
                    wk = w_parent[k][:, :, None]  # [bn, p, 1]
                    outs.append(jnp.sum(wk * x, axis=1, keepdims=True))  # [bn, 1, X]
                return jnp.concatenate(outs, axis=1).reshape(nb, -1)

            def mix_pair(x_e_nb):  # rows [e, n, p] -> selected [nb, X]
                # out[n, k, :] = sum_{p,e} sel[k, n, p, e] * x[e, n, p, :]
                x = jnp.transpose(
                    x_e_nb.reshape(beam, bn, beam, -1), (1, 2, 0, 3)
                )  # [n, p, e, X]
                outs = []
                for k in range(beam):
                    wk = jnp.transpose(sel_pb[k], (0, 1, 2))[:, :, :, None]  # [n, p, e, 1]
                    outs.append(jnp.sum(wk * x, axis=(1, 2), keepdims=False)[:, None, :])
                return jnp.concatenate(outs, axis=1).reshape(nb, -1)

            val_h[:] = mix_pair(vh_new)
            val_c[:] = mix_pair(vc_new)

            # chosen new tokens (f32 exact for ids < 2^24)
            new_tok = mix_pair(tok_ids.reshape(beam * nb, 1)).reshape(
                bn, beam
            ).astype(jnp.int32)

            # policy state: parent reorder, then advance with the new token
            ph = mix_parent(pol_h[:])
            pc = mix_parent(pol_c[:])
            hot_new = (col_vb == new_tok.reshape(nb, 1)).astype(wd)
            emb_new = jnp.dot(hot_new, p_emb_ref[:], preferred_element_type=f32)
            i2, f2, g2, o2 = _lstm_gates(
                emb_new, ph, p_wi_ref[:], p_wh_ref[:], p_b_ref[:], hidden
            )
            pol_c[:] = f2 * pc + i2 * g2
            pol_h[:] = o2 * jnp.tanh(pol_c[:])

            # token history: parent reorder, then append
            hist_f = hist[:, :].astype(f32)  # [T, nb]
            hist_sel = jnp.transpose(
                mix_parent(jnp.transpose(hist_f, (1, 0))), (1, 0)
            )
            hist[:, :] = hist_sel.astype(jnp.int32)
            hist[pl.ds(t + 1, 1), :] = new_tok.reshape(1, nb)
            return 0

        jax.lax.fori_loop(0, steps, step_fn, 0)
        # hist [T, nb] -> [bn, beam*T] batch-major (b-major then t)
        h = jnp.transpose(hist[:, :].reshape(steps + 1, bn, beam), (1, 2, 0))
        out_tokens_ref[:, :] = h.reshape(bn, beam * (steps + 1))
        out_scores_ref[:, :] = scores[:]

    pl.run_scoped(
        body,
        pltpu.VMEM((steps + 1, nb), jnp.int32),  # history
        pltpu.VMEM((nb, hidden), jnp.float32),  # pol_h
        pltpu.VMEM((nb, hidden), jnp.float32),  # pol_c
        pltpu.VMEM((nb, hidden), jnp.float32),  # val_h
        pltpu.VMEM((nb, hidden), jnp.float32),  # val_c
        pltpu.VMEM((bn, beam), jnp.float32),  # scores
    )


@functools.partial(
    jax.jit, static_argnames=("max_len", "beam", "block_n", "weight_dtype",
                              "value_weight", "logprob_weight", "interpret")
)
def fused_beam_search(
    policy_params: dict,
    value_params: dict,
    features: jax.Array,
    start_tokens: jax.Array,
    max_len: int = 17,
    beam: int = 5,
    block_n: int = 32,
    weight_dtype=jnp.bfloat16,
    value_weight: float = 0.6,
    logprob_weight: float = 0.4,
    interpret: bool = False,
):
    """Per-sample value-guided beam search, fully fused.

    Matches :func:`..decode.beam.beam_search` with
    ``DecodeConfig(per_sample_beams=True)``. Returns
    ``(tokens [N, beam, T], scores [N, beam])``, beam 0 best.
    """
    if "lstm" not in policy_params or "lstm" not in value_params:
        raise ValueError("fused beam search requires unidirectional networks")
    n, feat_dim = features.shape
    vocab, emb_dim = policy_params["embedding"].shape
    hidden = policy_params["lstm"]["wh"].shape[0]
    vp = _round_up(vocab, 128)
    n_pad = _round_up(n, block_n)
    wd = weight_dtype

    def pad_emb(e):
        return jnp.zeros((vp, e.shape[1]), wd).at[:vocab].set(e.astype(wd))

    p = policy_params
    v = value_params
    p_emb = pad_emb(p["embedding"])
    p_wo = jnp.zeros((hidden, vp), wd).at[:, :vocab].set(p["head"]["w"].astype(wd))
    p_bo = jnp.full((1, vp), _NEG, jnp.float32).at[0, :vocab].set(
        p["head"]["b"].astype(jnp.float32))
    v_emb = pad_emb(v["embedding"])

    feats = jnp.zeros((n_pad, feat_dim), jnp.float32).at[:n].set(features.astype(jnp.float32))
    start = jnp.zeros((n_pad, 1), jnp.int32).at[:n, 0].set(start_tokens.astype(jnp.int32))

    grid = (n_pad // block_n,)
    tile = lambda i: (i, 0)  # noqa: E731
    whole = lambda i: (0, 0)  # noqa: E731
    vm = lambda shape, index_map: pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)  # noqa: E731

    out_tokens, out_scores = pl.pallas_call(
        functools.partial(
            _beam_kernel, steps=max_len - 1, beam=beam,
            vw=value_weight, lw=logprob_weight,
        ),
        grid=grid,
        in_specs=[
            vm((block_n, feat_dim), tile),
            vm((block_n, 1), tile),
            vm((feat_dim, hidden), whole),
            vm((1, hidden), whole),
            vm((vp, emb_dim), whole),
            vm((emb_dim, 4 * hidden), whole),
            vm((hidden, 4 * hidden), whole),
            vm((1, 4 * hidden), whole),
            vm((hidden, vp), whole),
            vm((1, vp), whole),
            vm((vp, emb_dim), whole),
            vm((emb_dim, 4 * hidden), whole),
            vm((hidden, 4 * hidden), whole),
            vm((1, 4 * hidden), whole),
            vm((feat_dim + hidden, hidden), whole),
            vm((1, hidden), whole),
            vm((hidden, 1), whole),
            vm((1, 1), whole),
        ],
        out_specs=(
            vm((block_n, beam * max_len), tile),
            vm((block_n, beam), tile),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, beam * max_len), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, beam), jnp.float32),
        ),
        interpret=interpret,
    )(
        feats, start,
        p["cnn2linear"]["w"].astype(wd), p["cnn2linear"]["b"].astype(jnp.float32)[None, :],
        p_emb, p["lstm"]["wi"].astype(wd), p["lstm"]["wh"].astype(wd),
        p["lstm"]["b"].astype(jnp.float32)[None, :], p_wo, p_bo,
        v_emb, v["lstm"]["wi"].astype(wd), v["lstm"]["wh"].astype(wd),
        v["lstm"]["b"].astype(jnp.float32)[None, :],
        v["linear1"]["w"].astype(wd), v["linear1"]["b"].astype(jnp.float32)[None, :],
        v["linear2"]["w"].astype(wd), v["linear2"]["b"].astype(jnp.float32)[None, :],
    )
    return out_tokens[:n].reshape(n, beam, max_len), out_scores[:n]

"""Fused value-guided beam-search Pallas TPU kernel.

The eval hot loop (reference trainers.py:73-105, ~480 RNN forwards per
127-image slice) as a single on-core program: per beam step, the policy
cell + vocab head, top-k expansion, B^2 critic cells + scoring, and the
beam selection/reordering all run from VMEM-resident weights.

Mosaic-friendly vectorization (per batch tile of ``bn`` images):

  * candidate rows are ``(b, n)``-major ``[B*bn, ...]`` blocks (row =
    beam*bn + sample — beams are contiguous row bands); every
    intermediate stays 2D/3D with ONLY leading-dim splits/merges —
    the TPU lowering does not support general transposes/relayouts
    (``jnp.transpose`` of reshaped 3D values crashes Mosaic; bisected
    in this environment), so:
      - top-k over vocab and top-B over the B^2 candidates are k rounds
        of (max, first-argmax-by-iota, mask) — pure elementwise+reduce;
      - the B expansions run as B separate critic cell matmuls whose
        outputs land directly in expansion-major *columns* ``[bn*B, B]``;
      - beam reordering (states, scores, token history) is a per-k
        weighted sum over the parent/expansion axes of leading-split 3D
        views — no gathers, no transposes;
      - token histories live batch-major ``[bn*B, T]``; the per-step
        append is a masked full-buffer select (dynamic *lane* stores
        don't lower).
  * per-sample beams with log-softmax scoring (the framework's default
    decode mode; the faithful batch-mean mode stays on the XLA path).

Token-exact against the XLA beam (:func:`..decode.beam.beam_search`)
under the Pallas interpreter (tests/test_pallas_beam.py), i.e. the
algorithm is exact. Compiled numerics: the kernel keeps weights in bf16
— which is the SAME rounding class as the XLA beam, because XLA's
DEFAULT matmul precision on TPU also multiplies f32 operands in bf16
(measured: Mosaic and XLA bf16 matmuls differ only in f32 accumulation
order, ~1e-5 absolute; VPU transcendentals are bitwise identical).
Residual token flips therefore happen only at genuine near-ties, where
XLA disagrees even with itself: at COCO shapes with random weights,
XLA-default vs XLA-highest flips 20/127 beam-0 captions while this
kernel vs XLA-default flips 16/127; with trained (peaked) weights the
kernel matches XLA-default 127/127 token-exactly (v5e, see
benchmarks/BENCHMARKS.md). Serving/eval therefore use *verified
dispatch*: first batch decoded by both, exact agreement locks in the
kernel (api.Captioner and train.loops.test_a2c_network, default
``use_fused_kernel=None``).

Measured on v5e at the COCO shapes: 4.4 ms vs 10.2 ms for a 127-slice
(2.3x at block 8; 3.8 ms = 2.7x at block 16, the serving default; block 32
exhausts VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import _NEG, VMEM_LIMIT, _lstm_gate_split, _round_up


def _lstm_step(x, h, c, wi, wh, b, hidden):
    f32 = jnp.float32
    gates = (
        jnp.dot(x, wi, preferred_element_type=f32)
        + jnp.dot(h.astype(wi.dtype), wh, preferred_element_type=f32)
        + b
    )
    i, f, g, o = _lstm_gate_split(gates, hidden)
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def _max_mask_rounds(scores, k, col):
    """k rounds of (max, first-argmax, mask) over the last axis.

    scores: [rows, C]; col: iota [rows, C].
    Returns (vals [rows, k] desc, onehots: k x [rows, C] f32).
    """
    c = scores.shape[-1]
    vals, hots = [], []
    cur = scores
    for _ in range(k):
        m = jnp.max(cur, axis=-1, keepdims=True)
        first = jnp.min(jnp.where(cur == m, col, c), axis=-1, keepdims=True)
        hot = (col == first).astype(jnp.float32)
        vals.append(m)
        hots.append(hot)
        cur = jnp.where(hot > 0, _NEG, cur)
    return jnp.concatenate(vals, axis=-1), hots


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
    t_max = steps + 1
    nb = bn * beam  # candidate rows, (b, n)-major: row = b * bn + n
    wd = p_emb_ref.dtype

    def rep_beam(x):  # [bn, X] -> [nb, X], (b, n)-major
        return jnp.concatenate([x] * beam, axis=0)

    def body(hist, pol_h, pol_c, val_h, val_c, scores):
        # --- init: every beam holds <START>; only beam 0 is live ------------
        start = start_ref[:, 0:1]  # [bn, 1]
        col_t = jax.lax.broadcasted_iota(jnp.int32, (nb, t_max), 1)
        hist[:, :] = jnp.where(col_t == 0, rep_beam(start), 0)

        col_v = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
        # cast features like XLA DEFAULT does (both matmul operands in
        # bf16): an uncast f32 x here diverges every downstream state
        h0 = (
            jnp.dot(feats_ref[:].astype(wd), p_wc_ref[:], preferred_element_type=f32)
            + p_bc_ref[:]
        )
        emb0 = jnp.dot((col_v == start).astype(wd), p_emb_ref[:], preferred_element_type=f32)
        h1, c1 = _lstm_step(
            emb0.astype(wd), h0, jnp.zeros((bn, hidden), f32),
            p_wi_ref[:], p_wh_ref[:], p_b_ref[:], hidden,
        )
        pol_h[:] = rep_beam(h1)
        pol_c[:] = rep_beam(c1)

        vemb0 = jnp.dot((col_v == start).astype(wd), v_emb_ref[:], preferred_element_type=f32)
        vh1, vc1 = _lstm_step(
            vemb0.astype(wd), jnp.zeros((bn, hidden), f32), jnp.zeros((bn, hidden), f32),
            v_wi_ref[:], v_wh_ref[:], v_b_ref[:], hidden,
        )
        val_h[:] = rep_beam(vh1)
        val_c[:] = rep_beam(vc1)

        # scores [nb, 1], (b, n)-major: rows 0..bn-1 are beam 0 (live)
        row_id = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
        scores[:] = jnp.where(row_id < bn, 0.0, -_NEG).astype(f32)

        col_vb = jax.lax.broadcasted_iota(jnp.int32, (nb, vp), 1)
        col_bb = jax.lax.broadcasted_iota(jnp.int32, (bn, beam * beam), 1)
        feats_nb = rep_beam(feats_ref[:])  # [nb, F]

        def step_fn(t, _):
            # 1) policy logits + log-softmax normalizer per candidate
            logits = (
                jnp.dot(pol_h[:].astype(wd), p_wo_ref[:], preferred_element_type=f32)
                + p_bo_ref[:]
            )  # [nb, vp]
            lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)

            # 2) top-B expansions per candidate
            topv, hots = _max_mask_rounds(logits, beam, col_vb)  # [nb, B], B x [nb, vp]
            logp = topv - lse  # [nb, beam(e)]
            tok_cols = jnp.concatenate(
                [jnp.sum(h * col_vb.astype(f32), axis=1, keepdims=True) for h in hots],
                axis=1,
            )  # [nb, beam(e)] token ids (f32, exact below 2^24)

            # 3) critic: one cell matmul per expansion; values land as columns
            val_cols, vh_es, vc_es = [], [], []
            for h in hots:
                emb_e = jnp.dot(h.astype(wd), v_emb_ref[:], preferred_element_type=f32)
                vh_e, vc_e = _lstm_step(
                    emb_e.astype(wd), val_h[:], val_c[:],
                    v_wi_ref[:], v_wh_ref[:], v_b_ref[:], hidden,
                )
                state_cat = jnp.concatenate([feats_nb, vh_e], axis=1)
                v1 = (
                    jnp.dot(state_cat.astype(wd), v_w1_ref[:], preferred_element_type=f32)
                    + v_b1_ref[:]
                )
                # v_w2 is host-padded to 128 output columns (Mosaic cannot
                # lower single-column matmuls); only column 0 is real
                val_cols.append(
                    (jnp.dot(v1.astype(wd), v_w2_ref[:], preferred_element_type=f32)
                     + v_b2_ref[:])[:, 0:1]
                )  # [nb, 1]
                vh_es.append(vh_e)
                vc_es.append(vc_e)
            values = jnp.concatenate(val_cols, axis=1)  # [nb, beam(e)]

            # 4) accumulated candidate scores as per-sample columns:
            #    cand_flat[n, p*beam + e], built from static row-block slices
            cand = scores[:] - (vw * values + lw * logp)  # [nb, beam(e)]
            cand_flat = jnp.concatenate(
                [cand[pb * bn : (pb + 1) * bn, :] for pb in range(beam)], axis=1
            )  # [bn, beam*beam]

            # 5) per-sample top-B smallest (max-mask rounds on the negation)
            negv, sel_hots = _max_mask_rounds(-cand_flat, beam, col_bb)
            # sel_hots: B x [bn, beam*beam] one-hot over (p, e) pairs

            # 6) reorder under the selection — all 2D, static row blocks
            new_scores, new_vh, new_vc, new_tokens, new_ph, new_pc = [], [], [], [], [], []
            hist_now = hist[:, :].astype(f32)
            new_hist = []
            for k in range(beam):
                hot = sel_hots[k]  # [bn, beam*beam]
                new_scores.append(jnp.sum(cand_flat * hot, axis=1, keepdims=True))
                # parent weights: sum the e-columns of each parent block
                wp = [
                    jnp.sum(hot[:, pb * beam : (pb + 1) * beam], axis=1, keepdims=True)
                    for pb in range(beam)
                ]  # B x [bn, 1]
                # pair-weighted sums over (p, e)
                vh_k = None
                vc_k = None
                tok_k = None
                for pb in range(beam):
                    rows = slice(pb * bn, (pb + 1) * bn)
                    for e in range(beam):
                        w = hot[:, pb * beam + e : pb * beam + e + 1]  # [bn, 1]
                        vh_term = w * vh_es[e][rows]
                        vc_term = w * vc_es[e][rows]
                        tok_term = w * tok_cols[rows, e : e + 1]
                        vh_k = vh_term if vh_k is None else vh_k + vh_term
                        vc_k = vc_term if vc_k is None else vc_k + vc_term
                        tok_k = tok_term if tok_k is None else tok_k + tok_term
                new_vh.append(vh_k)
                new_vc.append(vc_k)
                new_tokens.append(tok_k)
                # parent-weighted sums (policy state, history)
                ph_k = None
                pc_k = None
                hist_k = None
                for pb in range(beam):
                    rows = slice(pb * bn, (pb + 1) * bn)
                    ph_term = wp[pb] * pol_h[rows, :]
                    pc_term = wp[pb] * pol_c[rows, :]
                    h_term = wp[pb] * hist_now[rows, :]
                    ph_k = ph_term if ph_k is None else ph_k + ph_term
                    pc_k = pc_term if pc_k is None else pc_k + pc_term
                    hist_k = h_term if hist_k is None else hist_k + h_term
                new_ph.append(ph_k)
                new_pc.append(pc_k)
                new_hist.append(hist_k)

            scores[:] = jnp.concatenate(new_scores, axis=0)  # (b, n)-major
            val_h[:] = jnp.concatenate(new_vh, axis=0)
            val_c[:] = jnp.concatenate(new_vc, axis=0)
            new_tok = jnp.concatenate(new_tokens, axis=0).astype(jnp.int32)  # [nb, 1]

            # policy: advance the reordered state with the chosen token.
            # Skipped on the last iteration — those logits would feed a
            # step that never runs (same dead-work cut as the XLA beam),
            # saving the final one-hot embed + cell matmuls.
            @pl.when(t < steps - 1)
            def _advance():
                ph = jnp.concatenate(new_ph, axis=0)
                pc = jnp.concatenate(new_pc, axis=0)
                emb_new = jnp.dot(
                    (col_vb == new_tok).astype(wd), p_emb_ref[:],
                    preferred_element_type=f32,
                )
                h_new, c_new = _lstm_step(
                    emb_new.astype(wd), ph, pc,
                    p_wi_ref[:], p_wh_ref[:], p_b_ref[:], hidden,
                )
                pol_h[:] = h_new
                pol_c[:] = c_new

            # history: reordered rows + masked append at column t+1
            hist[:, :] = jnp.where(
                col_t == t + 1, new_tok,
                jnp.concatenate(new_hist, axis=0).astype(jnp.int32),
            )
            return 0

        jax.lax.fori_loop(0, steps, step_fn, 0)
        out_tokens_ref[:, :] = hist[:, :]
        out_scores_ref[:, :] = scores[:]

    pl.run_scoped(
        body,
        pltpu.VMEM((nb, t_max), jnp.int32),  # token history, (b, n)-major
        pltpu.VMEM((nb, hidden), jnp.float32),  # pol_h
        pltpu.VMEM((nb, hidden), jnp.float32),  # pol_c
        pltpu.VMEM((nb, hidden), jnp.float32),  # val_h
        pltpu.VMEM((nb, hidden), jnp.float32),  # val_c
        pltpu.VMEM((nb, 1), jnp.float32),  # scores
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
    block_n: int = 0,
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
    if (
        value_params["embedding"].shape != policy_params["embedding"].shape
        or value_params["lstm"]["wh"].shape != policy_params["lstm"]["wh"].shape
    ):
        # the BlockSpecs below size the value blocks from the policy's
        # dims; mismatched nets (e.g. pretrained 300-d policy embedding
        # with a 512-d value net) must fail fast, not crash pallas_call
        raise ValueError(
            "fused beam search requires policy and value networks with "
            "matching embedding/hidden dims "
            f"(policy {policy_params['embedding'].shape}/"
            f"{policy_params['lstm']['wh'].shape}, "
            f"value {value_params['embedding'].shape}/"
            f"{value_params['lstm']['wh'].shape})"
        )
    n, feat_dim = features.shape
    if block_n == 0:
        # auto tile: measured on v5e with the 64 MiB VMEM budget —
        # a 127-slice runs best as one 128-wide tile (3.30 ms vs 3.58 at
        # block 16), superbatches as 64-wide tiles (17.1 ms vs 19.4 per
        # 1016 at block 16); see benchmarks/BENCHMARKS.md
        block_n = 128 if n <= 128 else 64
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
            vm((hidden, 128), whole),
            vm((1, 128), whole),
        ],
        out_specs=(
            vm((block_n * beam, max_len), tile),
            vm((block_n * beam, 1), tile),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad * beam, max_len), jnp.int32),
            jax.ShapeDtypeStruct((n_pad * beam, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # raise the 16 MiB Mosaic default scoped-VMEM budget (v5e has
            # 128 MiB physical): larger batch tiles become available
            vmem_limit_bytes=VMEM_LIMIT,
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
        jnp.zeros((hidden, 128), wd).at[:, 0:1].set(v["linear2"]["w"].astype(wd)),
        jnp.zeros((1, 128), jnp.float32).at[0, 0].set(v["linear2"]["b"][0].astype(jnp.float32)),
    )
    # Each grid tile writes a contiguous (beam, block_n)-major block of
    # rows, so the global layout is (tile, beam, n-within-tile)-major:
    # un-interleave per tile (cheap jnp ops outside the kernel).
    g = n_pad // block_n
    toks = (
        out_tokens.reshape(g, beam, block_n, max_len)
        .transpose(0, 2, 1, 3)
        .reshape(n_pad, beam, max_len)
    )
    scrs = out_scores.reshape(g, beam, block_n).transpose(0, 2, 1).reshape(n_pad, beam)
    return toks[:n], scrs[:n]

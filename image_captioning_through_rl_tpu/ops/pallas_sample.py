"""Fused stochastic-sampling decode Pallas TPU kernel.

The XLA sampling path (:func:`..decode.sample.sample_decode`) is a
``lax.scan`` whose T-1 steps each re-read the ~13 MB of LSTM weights
from HBM and pay a per-step ``lax.top_k`` / full-vocab sort for the
top-k / nucleus filters. This kernel is the sampling twin of
:func:`.pallas_decode.fused_greedy_decode`: the whole decode loop runs
on-core with every weight resident in VMEM, via the rollout kernel's
``(batch tile, step)`` grid with the carried LSTM state in VMEM scratch
(:mod:`.pallas_rollout`).

Sampling parity (the verified-dispatch contract, utils/dispatch.py):

* the per-step Gumbel noise is generated OUTSIDE the kernel with the
  exact key schedule ``sample_decode`` uses (carry ``key``; per step
  ``key, sub = split(key)``; ``categorical(sub, scaled)``) and streamed
  in step-major — the Gumbel-max trick IS ``jax.random.categorical``,
  so the fused decode reproduces the XLA path's drawn tokens (bit-exact
  under the interpreter; bf16-class on hardware, where XLA's DEFAULT
  matmuls are bf16 too — the canary batch decides at serve time).
* the top-k / top-p filters are computed WITHOUT a sort: both reduce to
  "keep logits >= the row's threshold value", and the threshold is
  found by 32-step bisection over a total-order-preserving f32->int32
  key space (:func:`keyspace_threshold`) — exact, tie-compatible with
  ``lax.top_k``'s "ties at the k-th value all survive" semantics, and
  with TRACED ``k``/``p`` (the XLA path recompiles per ``top_k``; this
  kernel has one program per (top_k on/off, top_p on/off) variant).

The reference decodes only deterministically (greedy trainers.py:57-70,
beam trainers.py:75-130); sampling is a framework-added decode mode
(see ..decode.sample), so the bar here is the fused greedy/beam
kernels', not a reference translation.

Memory: the streamed Gumbel tensor is ``[S*N, Vp]`` f32 in HBM —
O(steps x batch x vocab). Callers cap the fused path's batch (api.py
routes oversized sampled batches to the XLA scan) so this stays a few
hundred MB at most.

Measured dispatch policy (v5e, COCO shapes — benchmarks/MEASURED.md):
FILTERED sampling is 1.35x (top-k @1024) to 4.9x (top-k+top-p @8192)
faster fused — the XLA scan pays a full-vocab ``lax.top_k``/sort per
step. PLAIN sampling is a fused LOSS (0.28-0.80x): XLA's unfiltered
step is already matmul-bound with its Gumbel draw fused on-the-fly,
while this kernel pays the streamed Gumbel tensor's HBM round trip.
api.py therefore serves unfiltered requests via XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import VMEM_LIMIT, _NEG, _lstm_gate_split, _round_up

# Largest fused-path batch (rows x samples): above this the streamed
# Gumbel tensor (steps x n x vocab f32) stops paying for the resident
# weights it saves. 8192 rows x 16 steps x 1024 vocab = 512 MB HBM.
MAX_FUSED_ROWS = 8192


def monotone_keys(x: jax.Array) -> jax.Array:
    """Total-order-preserving f32 -> int32 map (``a < b`` iff
    ``key(a) < key(b)``, with ``-0.0`` canonicalized to ``+0.0`` so the
    key order matches IEEE float comparisons). Standard sign-magnitude
    fold: non-negative floats keep their bit pattern; negative floats
    flip their low 31 bits (monotone-decreasing magnitudes map to
    monotone-increasing negative ints). Subnormals are flushed to zero
    by the ``+ 0.0`` canonicalization under XLA/TPU FTZ arithmetic —
    harmless here (logit-scale inputs are never subnormal, and flushed
    values are float-compare-indistinguishable from 0 on TPU anyway)."""
    i = jax.lax.bitcast_convert_type(x + 0.0, jnp.int32)
    return i ^ jnp.where(i < 0, jnp.int32(0x7FFFFFFF), jnp.int32(0))


def keyspace_threshold(keys: jax.Array, w: jax.Array, budget: jax.Array
                       ) -> jax.Array:
    """Per-row smallest int32 ``j`` with ``sum(w * (keys > j)) < budget``.

    ``keys [N, V]`` int32 (from :func:`monotone_keys`), ``w [N, V]`` f32
    weights (ones -> count/top-k; softmax numerators -> mass/top-p),
    ``budget`` broadcastable to ``[N, 1]`` f32. The predicate
    ``P(j) = mass-strictly-above-j < budget`` is monotone in ``j``, so
    32 bisection steps over the full int32 range converge exactly;
    converged rows stall harmlessly (``lo`` keeps ``P`` false, ``hi``
    keeps ``P`` true). The midpoint is computed overflow-free
    (``hi - lo`` can exceed int32 range when keys span both signs).

    Callers guarantee ``P(rowmin - 1)`` is false (total mass >= budget,
    i.e. ``k <= V`` and ``p <= 1``); ``P(rowmax)`` is always true (the
    strict tail above the max is empty and budgets are positive).

    Returned ``hi`` satisfies: ``keys >= hi`` is EXACTLY the keep set
    ``{x : x >= v*}`` where ``v*`` is the row's k-th largest value
    (counting duplicates) resp. the nucleus boundary value — the same
    sets :func:`..decode.sample.filter_logits` keeps (docs/DESIGN.md
    derives the tie cases).
    """
    lo = jnp.min(keys, axis=-1, keepdims=True) - 1
    hi = jnp.max(keys, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)  # floor((lo+hi)/2)
        mass = jnp.sum(jnp.where(keys > mid, w, 0.0), axis=-1, keepdims=True)
        p_true = mass < budget
        return jnp.where(p_true, lo, mid), jnp.where(p_true, mid, hi)

    _, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return hi


def filter_scaled_logits(scaled: jax.Array, k, p, use_top_k: bool,
                         use_top_p: bool) -> jax.Array:
    """Mask temperature-scaled logits to the top-k / nucleus keep set
    (else ``_NEG``) via :func:`keyspace_threshold` — the sort-free
    equivalent of :func:`..decode.sample.filter_logits`, shared verbatim
    between the Pallas kernel body and the pure-jnp unit tests (same
    composition order: k first, nucleus mass over the renormalized
    survivors). ``k``/``p`` are traced scalars; the on/off flags are
    static."""
    if not (use_top_k or use_top_p):
        return scaled
    keys = monotone_keys(scaled)
    ones = jnp.ones(scaled.shape, jnp.float32)
    if use_top_k:
        thr = keyspace_threshold(keys, ones, jnp.asarray(k, jnp.float32))
        keep = keys >= thr
        scaled = jnp.where(keep, scaled, _NEG)
        if use_top_p:
            keys = monotone_keys(scaled)
    if use_top_p:
        m = jnp.max(scaled, axis=-1, keepdims=True)
        e = jnp.exp(scaled - m)  # masked rows underflow to exactly 0
        z = jnp.sum(e, axis=-1, keepdims=True)
        thr = keyspace_threshold(keys, e, jnp.asarray(p, jnp.float32) * z)
        scaled = jnp.where(keys >= thr, scaled, _NEG)
    return scaled


def _kernel(feats_ref, start_ref, gumbel_ref, temp_ref, k_ref, p_ref,
            wc_ref, bc_ref, emb_ref, wi_ref, wh_ref, b_ref, wo_ref, bo_ref,
            out_ref, h_s, c_s, tok_s, *, use_top_k: bool, use_top_p: bool):
    f32 = jnp.float32
    s = pl.program_id(1)
    bn = feats_ref.shape[0]
    vp = emb_ref.shape[0]
    hidden = wh_ref.shape[0]
    wd = emb_ref.dtype

    @pl.when(s == 0)
    def _init():
        h_s[:] = (jnp.dot(feats_ref[:], wc_ref[:], preferred_element_type=f32)
                  + bc_ref[:])
        c_s[:] = jnp.zeros_like(c_s)
        tok_s[:] = start_ref[:]
        out_ref[0:1, :] = start_ref[:]

    h, c, tok = h_s[:], c_s[:], tok_s[0:1, :]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
    onehot = (col_ids == tok.reshape(bn, 1)).astype(wd)
    x = jnp.dot(onehot, emb_ref[:], preferred_element_type=f32)
    gates = (
        jnp.dot(x.astype(wd), wi_ref[:], preferred_element_type=f32)
        + jnp.dot(h.astype(wd), wh_ref[:], preferred_element_type=f32)
        + b_ref[:]
    )
    i, f, g, o = _lstm_gate_split(gates, hidden)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    logits = jnp.dot(h.astype(wd), wo_ref[:], preferred_element_type=f32) + bo_ref[:]

    scaled = filter_scaled_logits(logits / temp_ref[0, 0], k_ref[0, 0],
                                  p_ref[0, 0], use_top_k, use_top_p)

    # Gumbel-max draw == jax.random.categorical with the same key
    noisy = scaled + gumbel_ref[:]
    m = jnp.max(noisy, axis=-1, keepdims=True)
    nxt = jnp.min(jnp.where(noisy == m, col_ids, vp), axis=1).astype(
        jnp.int32).reshape(1, bn)
    out_ref[pl.ds(s + 1, 1), :] = nxt

    h_s[:] = h
    c_s[:] = c
    tok_s[:] = nxt


def sample_step_keys(rng: jax.Array, steps: int) -> jax.Array:
    """The per-step subkeys ``sample_decode`` draws: carry ``key``,
    per step ``key, sub = split(key)`` — reproduced here so the
    outside-generated Gumbel stream matches the XLA scan's draws
    key-for-key."""
    def body(key, _):
        key, sub = jax.random.split(key)
        return key, sub

    _, subs = jax.lax.scan(body, rng, None, length=steps)
    return subs


@functools.partial(
    jax.jit,
    static_argnames=("max_len", "use_top_k", "use_top_p", "block_n",
                     "weight_dtype", "interpret"),
)
def _fused_sample(params, features, start_tokens, rng, temp, k, p, *,
                  max_len, use_top_k, use_top_p, block_n, weight_dtype,
                  interpret):
    n, feat_dim = features.shape
    vocab, emb_dim = params["embedding"].shape
    hidden = params["lstm"]["wh"].shape[0]
    steps = max_len - 1
    f32 = jnp.float32

    vp = _round_up(vocab, 128)
    block_n = min(block_n, _round_up(n, 128))
    n_pad = _round_up(n, block_n)
    tiles = n_pad // block_n
    wd = weight_dtype

    # Gumbel noise with the XLA path's exact keys at the REAL (n, vocab)
    # shape (threefry is position-keyed row-major, so padding columns
    # would shift every counter; pad with zeros afterwards instead)
    subs = sample_step_keys(rng, steps)
    gumbel = jax.vmap(lambda kk: jax.random.gumbel(kk, (n, vocab), f32))(subs)
    gum_sm = (
        jnp.zeros((steps, n_pad, vp), f32)
        .at[:, :n, :vocab].set(gumbel)
        .reshape(steps * n_pad, vp)
    )

    emb = jnp.zeros((vp, emb_dim), wd).at[:vocab].set(params["embedding"].astype(wd))
    wo = jnp.zeros((hidden, vp), wd).at[:, :vocab].set(params["head"]["w"].astype(wd))
    bo = jnp.full((1, vp), _NEG, f32).at[0, :vocab].set(
        params["head"]["b"].astype(f32)
    )
    wc = params["cnn2linear"]["w"].astype(wd)
    bc = params["cnn2linear"]["b"].astype(f32)[None, :]
    wi = params["lstm"]["wi"].astype(wd)
    wh = params["lstm"]["wh"].astype(wd)
    b = params["lstm"]["b"].astype(f32)[None, :]

    feats = jnp.zeros((n_pad, feat_dim), f32).at[:n].set(features.astype(f32))
    start = jnp.zeros((1, n_pad), jnp.int32).at[0, :n].set(
        start_tokens.astype(jnp.int32))

    vm = lambda shape, index_map: pl.BlockSpec(  # noqa: E731
        shape, index_map, memory_space=pltpu.VMEM)
    tile = lambda i, s: (i, 0)  # noqa: E731
    tile_minor = lambda i, s: (0, i)  # noqa: E731
    whole = lambda i, s: (0, 0)  # noqa: E731
    stream = lambda i, s: (s * tiles + i, 0)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(_kernel, use_top_k=use_top_k, use_top_p=use_top_p),
        grid=(tiles, steps),
        in_specs=[
            vm((block_n, feat_dim), tile),
            vm((1, block_n), tile_minor),
            vm((block_n, vp), stream),
            vm((1, 1), whole), vm((1, 1), whole), vm((1, 1), whole),
            vm((feat_dim, hidden), whole), vm((1, hidden), whole),
            vm((vp, emb_dim), whole),
            vm((emb_dim, 4 * hidden), whole), vm((hidden, 4 * hidden), whole),
            vm((1, 4 * hidden), whole),
            vm((hidden, vp), whole), vm((1, vp), whole),
        ],
        out_specs=vm((max_len, block_n), tile_minor),
        out_shape=jax.ShapeDtypeStruct((max_len, n_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block_n, hidden), f32),
            pltpu.VMEM((block_n, hidden), f32),
            pltpu.VMEM((1, block_n), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(
        feats, start, gum_sm,
        jnp.full((1, 1), temp, f32), jnp.full((1, 1), k, jnp.int32),
        jnp.full((1, 1), p, f32),
        wc, bc, emb, wi, wh, b, wo, bo,
    )
    return out.T[:n]


def fused_sample_decode(
    params: dict,
    features: jax.Array,
    start_tokens: jax.Array,
    rng: jax.Array,
    max_len: int = 17,
    temperature=1.0,
    top_k: int = 0,
    top_p=None,
    block_n: int = 1024,
    weight_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Stochastic decode via the fused kernel (unidirectional policies).

    Args mirror :func:`..decode.sample.sample_decode`; ``weight_dtype``
    selects the resident-weight precision (bf16 default, f32 for exact
    parity with the XLA path — what the verified-dispatch canary and
    the parity tests compare). ``temperature``/``top_k``/``top_p`` are
    traced: sweeping them costs no recompiles (one program per
    (top-k on/off, top-p on/off) variant).
    """
    if "lstm" not in params:
        raise ValueError("fused decode requires a unidirectional policy")
    vocab = params["embedding"].shape[0]
    k = int(top_k)
    use_top_k = 0 < k < vocab
    use_top_p = top_p is not None
    return _fused_sample(
        params, features, start_tokens, rng,
        jnp.asarray(temperature, jnp.float32),
        jnp.int32(k if use_top_k else 0),
        jnp.asarray(top_p if use_top_p else 1.0, jnp.float32),
        max_len=max_len, use_top_k=use_top_k, use_top_p=use_top_p,
        block_n=block_n, weight_dtype=weight_dtype, interpret=interpret,
    )

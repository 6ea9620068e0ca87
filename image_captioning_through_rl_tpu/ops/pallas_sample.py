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

* the per-step Gumbel noise is generated IN-KERNEL on the VPU with the
  exact key schedule ``sample_decode`` uses (carry ``key``; per step
  ``key, sub = split(key)``; ``categorical(sub, scaled)``): only the
  tiny ``[steps, 2]`` subkey table enters the kernel, and each logit
  element recomputes its own draw as ``threefry2x32(subkey, counter)``
  — jax's *partitionable* threefry assigns every element of a
  ``random_bits`` call the independent 64-bit counter ``(0, flat_idx)``
  and takes ``y0 ^ y1`` of the hash (jax._src.prng's
  ``_threefry_random_bits_partitionable``), so the noise is a pure
  elementwise function of (subkey, row*vocab+col) — no HBM stream, no
  cross-element coupling, bit-exact vs ``jax.random.gumbel`` on both
  CPU and Mosaic (measured: the 20-round int32 hash, the bits->f32
  uniform map, and the double-log all agree bitwise). The Gumbel-max
  trick IS ``jax.random.categorical``, so the fused decode reproduces
  the XLA path's drawn tokens (bit-exact under the interpreter;
  bf16-class on hardware, where XLA's DEFAULT matmuls are bf16 too —
  the canary batch decides at serve time).
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

Memory: nothing scales with steps x batch x vocab any more (round 4
streamed a ``[S*N, Vp]`` f32 Gumbel tensor through HBM, which made
plain sampling a measured loss and forced an 8192-row cap). The only
size limit left is the int32 counter space: per-step flat indices are
``row * vocab + col``, so the padded batch must satisfy
``n_pad * vocab < 2**31`` (:func:`fused_rows_ok`) — ~2M rows at COCO's
1004-word vocab.

Measured dispatch policy (v5e, COCO shapes — BENCHMARKS.md round 5,
benchmarks/exp_sample_noise.py): FILTERED sampling is 1.56x (top-k
@1024) to 5.02x (top-k+top-p @32768) faster fused — the XLA scan pays
a full-vocab ``lax.top_k``/sort per step, and the lifted row cap means
large filtered batches no longer cliff onto that sort. PLAIN sampling
stays an honest fused LOSS (0.18x @1024 -> 0.97x @32768; XLA's
unfiltered step is already matmul-bound), so api.py keeps unfiltered
requests on the XLA scan — see BENCHMARKS.md round 5 for the ledger
and the noise-cost control.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import VMEM_LIMIT, _NEG, _lstm_gate_split, _round_up

def fused_rows_ok(rows: int, vocab: int, block_n: int = 1024) -> bool:
    """Whether a ``rows``-row batch fits the fused path's threefry
    counter space: per-step flat counters are ``row * vocab + col`` in
    int32, so the PADDED batch must keep ``n_pad * vocab < 2**31``
    (~2M rows at COCO's 1004-word vocab). This replaced round 4's
    8192-row Gumbel-stream cap — with in-kernel noise there is no
    per-row HBM cost left to bound."""
    rows = max(int(rows), 1)
    bn = min(block_n, _round_up(rows, 128))
    return _round_up(rows, bn) * vocab < 2**31


_TINY = np.float32(1.1754944e-38)  # np.finfo(np.float32).tiny


def threefry2x32_bits(k0: jax.Array, k1: jax.Array, idx: jax.Array
                      ) -> jax.Array:
    """Per-element random bits of jax's PARTITIONABLE threefry: the
    20-round threefry-2x32 hash of the 64-bit counter ``(hi=0, lo=idx)``
    under key ``(k0, k1)``, output ``y0 ^ y1`` — exactly
    ``random_bits(key, 32, shape)`` for arrays smaller than 2**32
    elements (jax._src.prng._threefry_random_bits_partitionable; the
    repo pins ``jax_threefry_partitionable=True``, the jax>=0.4.30
    default). All int32 (Mosaic has no uint32 path): two's-complement
    wraparound adds, logical shifts, and xors are bit-identical to the
    uint32 reference. ``idx`` must be < 2**31 (:func:`fused_rows_ok`).

    Pure jnp — runs identically inside a Pallas kernel body (VPU),
    under jit, and in the parity unit tests.
    """
    i32 = jnp.int32
    ks2 = k0 ^ k1 ^ i32(0x1BD11BDA)

    def rot(x, d):
        return jax.lax.shift_left(x, i32(d)) | jax.lax.shift_right_logical(
            x, i32(32 - d))

    def rounds(x0, x1, rots):
        for d in rots:
            x0 = x0 + x1
            x1 = rot(x1, d)
            x1 = x0 ^ x1
        return x0, x1

    r0, r1 = (13, 15, 26, 6), (17, 29, 16, 24)
    x0 = jnp.zeros_like(idx) + k0
    x1 = idx + k1
    x0, x1 = rounds(x0, x1, r0)
    x0, x1 = rounds(x0 + k1, x1 + (ks2 + i32(1)), r1)
    x0, x1 = rounds(x0 + ks2, x1 + (k0 + i32(2)), r0)
    x0, x1 = rounds(x0 + k0, x1 + (k1 + i32(3)), r1)
    x0, x1 = rounds(x0 + k1, x1 + (ks2 + i32(4)), r0)
    return (x0 + ks2) ^ (x1 + (k0 + i32(5)))


def gumbel_from_bits(bits: jax.Array) -> jax.Array:
    """Random bits -> standard Gumbel, reproducing ``jax.random.gumbel``
    (mode="low", the default) bit for bit: mantissa-fill uniform in
    ``[0, 1)`` (``(bits >> 9) | 0x3f800000`` bitcast f32, minus 1), the
    ``uniform(minval=tiny, maxval=1)`` affine map, then
    ``-log(-log(u))`` — VPU transcendentals are bitwise identical to
    XLA's (CLAUDE.md TPU numerics facts)."""
    fb = jax.lax.shift_right_logical(bits, jnp.int32(9)) | jnp.int32(0x3F800000)
    f = jax.lax.bitcast_convert_type(fb, jnp.float32) - jnp.float32(1.0)
    u = jnp.maximum(_TINY, f * (jnp.float32(1.0) - _TINY) + _TINY)
    return -jnp.log(-jnp.log(u))


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


def _kernel(feats_ref, start_ref, keys_ref, temp_ref, k_ref, p_ref,
            wc_ref, bc_ref, emb_ref, wi_ref, wh_ref, b_ref, wo_ref, bo_ref,
            out_ref, h_s, c_s, tok_s, *, use_top_k: bool, use_top_p: bool,
            vocab: int):
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

    # Gumbel-max draw == jax.random.categorical with the same key: this
    # step's [n, vocab] draw is recomputed elementwise on the VPU from
    # the step subkey and the element's flat counter row*vocab + col
    # (partitionable threefry — see threefry2x32_bits). Padded rows and
    # columns hash garbage counters, but Gumbel noise is bounded
    # (~[-4.5, 16.6]) and padded columns carry _NEG logits, so they
    # never win the argmax; padded rows are sliced away by the caller.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 0)
    flat = (pl.program_id(0) * bn + row_ids) * vocab + col_ids
    # keys live whole in SMEM ([steps, 2] i32 — a Mosaic-legal scalar
    # block; tiny (1, 2) VMEM tiles violate the (8, 128) tiling rule)
    gumbel = gumbel_from_bits(
        threefry2x32_bits(keys_ref[s, 0], keys_ref[s, 1], flat))
    noisy = scaled + gumbel
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
    if n_pad * vocab >= 2**31:
        raise ValueError(
            f"fused sampling: {n} rows x {vocab} vocab exceeds the int32 "
            "threefry counter space (n_pad * vocab must stay < 2**31) — "
            "route through the XLA scan or chunk the batch"
        )

    # The XLA path's exact per-step subkeys ([steps, 2] raw words, a few
    # hundred bytes) — the per-element Gumbel noise itself is recomputed
    # in-kernel from these via partitionable threefry
    subs = sample_step_keys(rng, steps)
    raw = subs if jnp.issubdtype(subs.dtype, jnp.integer) else (
        jax.random.key_data(subs))
    keys_i32 = jax.lax.bitcast_convert_type(raw, jnp.int32)

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

    out = pl.pallas_call(
        functools.partial(_kernel, use_top_k=use_top_k, use_top_p=use_top_p,
                          vocab=vocab),
        grid=(tiles, steps),
        in_specs=[
            vm((block_n, feat_dim), tile),
            vm((1, block_n), tile_minor),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        feats, start, keys_i32,
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

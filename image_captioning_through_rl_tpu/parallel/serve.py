"""Batch-sharded decoding over a device mesh (multi-chip serving/eval).

The reference serves strictly single-device (SURVEY §2); here decoding
scales over the ``data`` axis of a :class:`jax.sharding.Mesh`: inputs
are committed to a batch sharding, parameters are replicated (the
models are ~40 MB — far below HBM, so tensor parallelism buys nothing
at serving time), and jit partitions the decode across chips with XLA
inserting any collectives. Per-sample beams and greedy decode are
embarrassingly batch-parallel, so the only cross-chip traffic is the
program launch itself.

Used by :func:`..train.loops.test_a2c_network` when a mesh is passed,
and directly for throughput serving. The batch is padded up to a
multiple of the mesh's ``data`` size (decode results for padded rows
are sliced off).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import DecodeConfig, NetConfig
from ..decode.beam import beam_search
from ..decode.greedy import greedy_decode
from ..decode.sample import sample_decode
from .sharding import _spans_processes as _multiprocess, replicate, shard_batch


def _pad_to_multiple(x: jax.Array, multiple: int) -> Tuple[jax.Array, int]:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], rem, axis=0)], axis=0)
    return x, n


# jit wrappers are cached per static config: a fresh jax.jit(lambda) per
# call would key the jit cache on the new wrapper object and re-trace +
# re-compile the whole decode program every invocation (per eval slice).
# The carried-state decode family serves BOTH direction modes (a bidi
# step needs only one backward cell per token — models/policy.py), so
# bidirectional policies no longer pay the O(T^2) full-prefix re-encode.
# On a multi-process mesh the token outputs are all-gathered to the
# replicated layout (out_shardings) so every host can read them back —
# a sharded global array is not addressable outside its owning processes.
@functools.lru_cache(maxsize=None)
def _greedy_jit(cfg: NetConfig, mesh: Optional[Mesh] = None):
    out = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        out = NamedSharding(mesh, P())
    return jax.jit(lambda p, f, s: greedy_decode(p, cfg, f, s), out_shardings=out)


@functools.lru_cache(maxsize=None)
def _beam_jit(cfg: NetConfig, dcfg: DecodeConfig, mesh: Optional[Mesh] = None):
    out = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        out = NamedSharding(mesh, P())
    return jax.jit(
        lambda p, v, f, s: beam_search(p, v, cfg, dcfg, f, s), out_shardings=out
    )


@functools.lru_cache(maxsize=None)
def _sample_jit(cfg: NetConfig, top_k: int, use_top_p: bool,
                mesh: Optional[Mesh] = None):
    out = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        out = NamedSharding(mesh, P())
    return jax.jit(
        lambda p, f, s, key, temp, tp: sample_decode(
            p, cfg, f, s, key,
            temperature=temp, top_k=top_k, top_p=tp if use_top_p else None,
        ),
        out_shardings=out,
    )


def sharded_sample_tokens(
    mesh: Mesh,
    policy_params: dict,
    cfg: NetConfig,
    features: jax.Array,
    start_tokens: jax.Array,
    rng: jax.Array,
    num_samples: int = 1,
    temperature=1.0,
    top_k: int = 0,
    top_p=None,
) -> jax.Array:
    """Stochastic decode with the batch sharded over ``mesh``'s data
    axis — the sampling twin of :func:`sharded_greedy_tokens`
    (sampling is batch-parallel by construction, so the only cross-chip
    traffic is the launch; bidirectional policies ride the same carried
    scan — models/policy.py).

    Token-exact vs the single-device :func:`..decode.sample
    .sample_decode_n` with the same key for ANY batch size: the per-step
    Gumbel draw is position-keyed (partitionable threefry), so neither
    the data-axis padding added here nor the device partitioning
    perturbs the real rows' noise — each chip computes its slice of the
    same global ``[N, V]`` draw. Returns ``[N, T]`` ids, or
    ``[N, R, T]`` when ``num_samples=R > 1`` (tiled samples-minor, one
    batched scan, exactly like ``sample_decode_n``).
    """
    if num_samples < 1:
        raise ValueError(f"num_samples must be >= 1, got {num_samples}")
    data = mesh.shape["data"]
    feats = jnp.asarray(features, jnp.float32)
    start = jnp.asarray(start_tokens)
    if num_samples > 1:
        feats = jnp.repeat(feats, num_samples, axis=0)
        start = jnp.repeat(start, num_samples, axis=0)
    feats, n = _pad_to_multiple(feats, data)
    start, _ = _pad_to_multiple(start, data)
    use_top_p = top_p is not None
    with mesh:
        params = replicate(mesh, policy_params)
        feats, start = shard_batch(mesh, feats, start)
        toks = _sample_jit(cfg, top_k, use_top_p,
                           mesh if _multiprocess(mesh) else None)(
            params, feats, start, rng,
            jnp.float32(temperature), jnp.float32(top_p if use_top_p else 1.0))
    toks = toks[:n]
    if num_samples > 1:
        toks = toks.reshape(n // num_samples, num_samples, toks.shape[-1])
    return toks


def sharded_greedy_tokens(
    mesh: Mesh,
    policy_params: dict,
    cfg: NetConfig,
    features: jax.Array,
    start_tokens: jax.Array,
) -> jax.Array:
    """Greedy decode with the batch sharded over ``mesh``'s data axis."""
    data = mesh.shape["data"]
    feats, n = _pad_to_multiple(jnp.asarray(features), data)
    start, _ = _pad_to_multiple(jnp.asarray(start_tokens), data)
    with mesh:
        params = replicate(mesh, policy_params)
        feats, start = shard_batch(mesh, feats, start)
        toks = _greedy_jit(cfg, mesh if _multiprocess(mesh) else None)(
            params, feats, start)
    return toks[:n]


def sharded_beam_tokens(
    mesh: Mesh,
    policy_params: dict,
    value_params: dict,
    cfg: NetConfig,
    dcfg: Optional[DecodeConfig],
    features: jax.Array,
    start_tokens: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Value-guided beam search sharded over ``mesh``'s data axis.

    Per-sample beams only (``dcfg.per_sample_beams=True``): the faithful
    batch-mean mode (Q2a) couples every sample in the batch through one
    shared ranking, which is a global argsort per step — semantically a
    single-device computation; shard requests, not that batch.
    Returns ``(tokens [N, B, T], scores [N, B])``.
    """
    dcfg = dcfg or DecodeConfig(max_seq_len=cfg.max_seq_len)
    if not dcfg.per_sample_beams:
        raise ValueError(
            "sharded beam decode requires per-sample beams; the batch-mean "
            "faithful mode (Q2) couples the whole batch on one device"
        )
    data = mesh.shape["data"]
    feats, n = _pad_to_multiple(jnp.asarray(features), data)
    start, _ = _pad_to_multiple(jnp.asarray(start_tokens), data)
    with mesh:
        pp = replicate(mesh, policy_params)
        vp = replicate(mesh, value_params)
        feats, start = shard_batch(mesh, feats, start)
        toks, scores = _beam_jit(cfg, dcfg, mesh if _multiprocess(mesh) else None)(
            pp, vp, feats, start)
    return toks[:n], scores[:n]

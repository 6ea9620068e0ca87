"""Experiment: where does fused greedy-decode time go?

Clones the production kernel with ablation switches (wrong tokens, same
shapes/layouts) to attribute per-step time: one-hot embed matmul, gate
transcendentals, vocab head + argmax. Scratch harness, not in the suite.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import policy
from image_captioning_through_rl_tpu.ops.pallas_decode import _round_up

VOCAB, FEAT, HID, T = 1004, 512, 512, 17


def _kernel(feats_ref, start_ref, wc_ref, bc_ref, emb_ref, wi_ref, wh_ref,
            b_ref, wo_ref, bo_ref, out_ref, *, steps, do_embed, do_trans,
            do_head, do_argmax):
    f32 = jnp.float32
    h = jnp.dot(feats_ref[:], wc_ref[:], preferred_element_type=f32) + bc_ref[:]
    c = jnp.zeros_like(h)
    tok = start_ref[0:1, :]
    out_ref[0:1, :] = tok

    bn = feats_ref.shape[0]
    vp = emb_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bn, vp), 1)
    wdtype = emb_ref.dtype
    hidden = wh_ref.shape[0]

    def body(t, carry):
        h, c, tok = carry
        if do_embed:
            onehot = (col_ids == tok.reshape(bn, 1)).astype(wdtype)
            x = jnp.dot(onehot, emb_ref[:], preferred_element_type=f32)
        else:
            x = h  # same shape, skips onehot+embed matmul
        gates = (
            jnp.dot(x.astype(wdtype), wi_ref[:], preferred_element_type=f32)
            + jnp.dot(h.astype(wdtype), wh_ref[:], preferred_element_type=f32)
            + b_ref[:]
        )
        if do_trans:
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        else:
            i = gates[:, :hidden] * 0.25
            f = gates[:, hidden:2 * hidden] * 0.25
            g = gates[:, 2 * hidden:3 * hidden] * 0.25
            o = gates[:, 3 * hidden:] * 0.25
        c = f * c + i * g
        h = o * (jnp.tanh(c) if do_trans else c * 0.25)
        if do_head:
            logits = jnp.dot(h.astype(wdtype), wo_ref[:], preferred_element_type=f32) + bo_ref[:]
            if do_argmax:
                tok = jnp.argmax(logits, axis=1).astype(jnp.int32).reshape(1, bn)
            else:
                tok = jnp.sum(logits[:, :8], axis=1).astype(jnp.int32).reshape(1, bn) % vp
        else:
            tok = (tok + 1) % vp
        out_ref[pl.ds(t + 1, 1), :] = tok
        return h, c, tok

    jax.lax.fori_loop(0, steps, body, (h, c, tok))


@functools.partial(jax.jit, static_argnames=(
    "max_len", "block_n", "do_embed", "do_trans", "do_head", "do_argmax"))
def ablate_decode(params, features, start_tokens, max_len=17, block_n=1024,
                  do_embed=True, do_trans=True, do_head=True, do_argmax=True):
    wd = jnp.bfloat16
    n, feat_dim = features.shape
    vocab, emb_dim = params["embedding"].shape
    hidden = params["lstm"]["wh"].shape[0]
    vp = _round_up(vocab, 128)
    block_n = min(block_n, _round_up(n, 128))
    n_pad = _round_up(n, block_n)

    emb = jnp.zeros((vp, emb_dim), wd).at[:vocab].set(params["embedding"].astype(wd))
    wo = jnp.zeros((hidden, vp), wd).at[:, :vocab].set(params["head"]["w"].astype(wd))
    bo = jnp.full((1, vp), -1e9, jnp.float32).at[0, :vocab].set(
        params["head"]["b"].astype(jnp.float32))
    wc = params["cnn2linear"]["w"].astype(wd)
    bc = params["cnn2linear"]["b"].astype(jnp.float32)[None, :]
    wi = params["lstm"]["wi"].astype(wd)
    wh = params["lstm"]["wh"].astype(wd)
    b = params["lstm"]["b"].astype(jnp.float32)[None, :]
    feats = jnp.zeros((n_pad, feat_dim), jnp.float32).at[:n].set(features.astype(jnp.float32))
    start = jnp.zeros((1, n_pad), jnp.int32).at[0, :n].set(start_tokens.astype(jnp.int32))

    grid = (n_pad // block_n,)
    tile = lambda i: (i, 0)
    tile_minor = lambda i: (0, i)
    whole = lambda i: (0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, steps=max_len - 1, do_embed=do_embed,
                          do_trans=do_trans, do_head=do_head, do_argmax=do_argmax),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(feats, start, wc, bc, emb, wi, wh, b, wo, bo)
    return out.T[:n]


def main():
    """Interleaved round-robin timing: the tunneled chip drifts 20-40%
    between processes and even across minutes, so variants are timed in
    alternating rounds and reported as the per-variant MINIMUM round."""
    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID, hidden_dim=HID)
    params = policy.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    n = 32768
    feats = jnp.asarray(rng.standard_normal((n, FEAT), dtype=np.float32))
    start = jnp.ones((n,), jnp.int32)

    variants = [
        ("full (production equiv)", dict()),
        ("no argmax (head only)", dict(do_argmax=False)),
        ("no head+argmax", dict(do_head=False, do_argmax=False)),
        ("no onehot-embed", dict(do_embed=False)),
        ("no transcendentals", dict(do_trans=False)),
        ("bare matmuls only", dict(do_embed=False, do_trans=False, do_head=False, do_argmax=False)),
    ]
    fns = [
        (name, (lambda kw: (lambda: ablate_decode(params, feats, start, block_n=1024, **kw)))(kw))
        for name, kw in variants
    ]
    # compile + warm
    for _, fn in fns:
        for _ in range(8):
            out = fn()
        np.asarray(out)
    best = {name: float("inf") for name, _ in fns}
    rounds, iters = 6, 8
    for _ in range(rounds):
        for name, fn in fns:
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            np.asarray(out)
            best[name] = min(best[name], (time.perf_counter() - t0) / iters * 1e3)
    for name, _ in fns:
        ms = best[name]
        print(f"{name:28s}: {ms:7.2f} ms  ({n / ms * 1e3:,.0f} cap/s)")


if __name__ == "__main__":
    main()

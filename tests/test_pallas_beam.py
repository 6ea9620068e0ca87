"""Fused beam-search kernel vs the XLA beam (interpret mode)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig
from image_captioning_through_rl_tpu.decode import beam_search
from image_captioning_through_rl_tpu.models import policy, value
from image_captioning_through_rl_tpu.ops.pallas_beam import fused_beam_search

from torch_oracles import rand_features

CFG = NetConfig(vocab_size=60, input_dim=16, wordvec_dim=16, hidden_dim=16, max_seq_len=7)


def _models():
    return (
        policy.init(jax.random.PRNGKey(0), CFG),
        value.init(jax.random.PRNGKey(1), CFG),
    )


def test_fused_beam_matches_xla_beam(rng_np):
    pp, vp = _models()
    feats = jnp.asarray(rand_features(rng_np, 6, CFG.input_dim))
    start = jnp.ones(6, jnp.int32)
    ref_t, ref_s = beam_search(
        pp, vp, CFG, DecodeConfig(beam_size=3, max_seq_len=CFG.max_seq_len), feats, start
    )
    got_t, got_s = fused_beam_search(
        pp, vp, feats, start, max_len=CFG.max_seq_len, beam=3, block_n=8,
        weight_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-4, atol=1e-4)


def test_fused_beam_multi_tile_grid(rng_np):
    """n > block_n exercises the multi-tile output layout: each grid tile
    writes a (beam, block_n)-major row block, so the host-side
    un-interleave must be per tile (round-1 bug scrambled beams/samples
    for every batch larger than one tile)."""
    pp, vp = _models()
    n = 20
    feats = jnp.asarray(rand_features(rng_np, n, CFG.input_dim))
    start = jnp.ones(n, jnp.int32)
    ref_t, ref_s = beam_search(
        pp, vp, CFG, DecodeConfig(beam_size=3, max_seq_len=CFG.max_seq_len), feats, start
    )
    got_t, got_s = fused_beam_search(
        pp, vp, feats, start, max_len=CFG.max_seq_len, beam=3, block_n=8,
        weight_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fused_beam_pads_ragged_batch(rng_np):
    pp, vp = _models()
    feats = jnp.asarray(rand_features(rng_np, 5, CFG.input_dim))  # not a tile multiple
    start = jnp.ones(5, jnp.int32)
    got_t, got_s = fused_beam_search(
        pp, vp, feats, start, max_len=CFG.max_seq_len, beam=3, block_n=8,
        weight_dtype=jnp.float32, interpret=True,
    )
    assert got_t.shape == (5, 3, CFG.max_seq_len)
    ref_t, _ = beam_search(
        pp, vp, CFG, DecodeConfig(beam_size=3, max_seq_len=CFG.max_seq_len), feats, start
    )
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))

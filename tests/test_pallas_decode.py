"""Fused Pallas decode kernel vs the XLA scan path (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.decode import greedy_decode
from image_captioning_through_rl_tpu.models import policy
from image_captioning_through_rl_tpu.ops.pallas_decode import fused_greedy_decode

from torch_oracles import rand_features

CFG = NetConfig(vocab_size=200, input_dim=128, wordvec_dim=128, hidden_dim=128, max_seq_len=9)


def test_fused_decode_matches_xla_scan(rng_np):
    params = policy.init(jax.random.PRNGKey(0), CFG)
    feats = jnp.asarray(rand_features(rng_np, 16, CFG.input_dim))
    start = jnp.ones(16, jnp.int32)
    ref = greedy_decode(params, CFG, feats, start)
    got = fused_greedy_decode(
        params, feats, start, max_len=CFG.max_seq_len,
        block_n=8, weight_dtype=jnp.float32, interpret=True,
    )
    assert got.shape == ref.shape
    # identical argmax paths modulo float-tie divergence; require near-total agreement
    agree = (np.asarray(got) == np.asarray(ref)).mean()
    assert agree > 0.99, agree


def test_fused_decode_pads_ragged_batch(rng_np):
    params = policy.init(jax.random.PRNGKey(1), CFG)
    feats = jnp.asarray(rand_features(rng_np, 5, CFG.input_dim))  # not a tile multiple
    start = jnp.ones(5, jnp.int32)
    got = fused_greedy_decode(
        params, feats, start, max_len=CFG.max_seq_len,
        block_n=8, weight_dtype=jnp.float32, interpret=True,
    )
    assert got.shape == (5, CFG.max_seq_len)
    ref = greedy_decode(params, CFG, feats, start)
    assert (np.asarray(got) == np.asarray(ref)).mean() > 0.99


def test_fused_decode_rejects_bidirectional():
    cfg = NetConfig(vocab_size=50, input_dim=16, wordvec_dim=16, hidden_dim=16, bidirectional=True)
    params = policy.init(jax.random.PRNGKey(2), cfg)
    try:
        fused_greedy_decode(params, jnp.zeros((4, 16)), jnp.ones(4, jnp.int32), interpret=True)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "unidirectional" in str(e)

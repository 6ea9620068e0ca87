"""Randomized-architecture differential parity vs the torch oracles.

The fixed-shape parity tests (test_models/test_decode/
test_realshape_parity) pin two shape points; this sweep draws a
deterministic family of NetConfigs — odd dims, wordvec != hidden !=
input, short/long sequences, uni and bidirectional — and requires
forward parity and greedy token parity against reference-semantics
torch oracles at every one, so no hidden shape assumption (a transpose
that only round-trips on square matrices, a dim tied to 512, a
max_seq_len baked to 17) can survive. Reference architecture:
models.py:33-262.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.decode import (
    greedy_decode,
    greedy_decode_full_prefix,
)
from image_captioning_through_rl_tpu.models import (
    policy,
    policy_from_torch,
    reward,
    reward_from_torch,
    value,
    value_from_torch,
)

from torch_oracles import (
    TorchPolicyOracle,
    TorchRewardOracle,
    TorchValueOracle,
    policy_state_dict,
    rand_captions,
    reward_state_dict,
    value_state_dict,
)


def _draw_cfg(i: int) -> NetConfig:
    rng = np.random.default_rng(1000 + i)
    return NetConfig(
        vocab_size=int(rng.integers(8, 90)),
        input_dim=int(rng.integers(3, 50)),
        wordvec_dim=int(rng.integers(3, 50)),
        hidden_dim=int(rng.integers(3, 50)),
        max_seq_len=int(rng.integers(4, 18)),
        bidirectional=bool(i % 2),  # alternate, so both modes get odd dims
        precision="highest",
    )


CASES = [_draw_cfg(i) for i in range(8)]


def _oracles(cfg: NetConfig):
    torch.manual_seed(hash((cfg.vocab_size, cfg.hidden_dim)) % (2**31))
    kw = dict(feat_dim=cfg.input_dim, emb_dim=cfg.wordvec_dim,
              hidden=cfg.hidden_dim, bidirectional=cfg.bidirectional)
    return (TorchPolicyOracle(cfg.vocab_size, **kw),
            TorchValueOracle(cfg.vocab_size, **kw),
            TorchRewardOracle(cfg.vocab_size, **kw))


@pytest.mark.slow
@pytest.mark.parametrize("cfg", CASES, ids=[
    f"v{c.vocab_size}_f{c.input_dim}_e{c.wordvec_dim}_h{c.hidden_dim}"
    f"_t{c.max_seq_len}{'_bi' if c.bidirectional else ''}" for c in CASES])
def test_random_architecture_parity(cfg, rng_np):
    n = int(rng_np.integers(2, 11))
    t = cfg.max_seq_len
    feats = rng_np.standard_normal((n, cfg.input_dim), dtype=np.float32)
    caps = rand_captions(rng_np, n, t, cfg.vocab_size)
    po, vo, ro = _oracles(cfg)

    # --- forward parity on all three nets (converter exercised too)
    with torch.no_grad():
        ref_logits = po(torch.from_numpy(feats)[None], torch.from_numpy(caps)).numpy()
        ref_vals = vo.forward_batched(torch.from_numpy(feats), torch.from_numpy(caps)).numpy()
        ref_ve, ref_se = (x.numpy() for x in ro.forward_batched(
            torch.from_numpy(feats), torch.from_numpy(caps)))

    pp = policy_from_torch(policy_state_dict(po), bidirectional=cfg.bidirectional)
    vp = value_from_torch(value_state_dict(vo), bidirectional=cfg.bidirectional)
    rp = reward_from_torch(reward_state_dict(ro), bidirectional=cfg.bidirectional)
    jf, jc = jnp.asarray(feats), jnp.asarray(caps)

    np.testing.assert_allclose(
        np.asarray(policy.forward(pp, cfg, jf, jc)), ref_logits,
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(value.forward(vp, cfg, jf, jc)), ref_vals,
        rtol=1e-4, atol=1e-4)
    ve, se = reward.forward(rp, cfg, jf, jc)
    np.testing.assert_allclose(np.asarray(ve), ref_ve, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(se), ref_se, rtol=1e-4, atol=1e-4)

    # --- greedy token parity vs the reference's O(T^2) loop
    # (trainers.py:65-70). Random weights can sit near argmax ties, so a
    # token mismatch is only a failure if the decision wasn't a near-tie
    # (the realshape margin audit's rule: drift << gap).
    with torch.no_grad():
        f = torch.from_numpy(feats)[None]
        tcaps = torch.ones((n, 1), dtype=torch.long)
        for _ in range(t - 1):
            out = po(f, tcaps)
            tcaps = torch.cat((tcaps, out[:, -1:, :].argmax(axis=2)), axis=1)
    decode_fn = greedy_decode_full_prefix if cfg.bidirectional else greedy_decode
    got = np.asarray(decode_fn(pp, cfg, jf, jnp.ones(n, jnp.int32)))
    ref_toks = tcaps.numpy()
    if not np.array_equal(got, ref_toks):
        rows, cols = np.nonzero(got != ref_toks)
        r, c = int(rows[0]), int(cols[0])  # first divergence decides
        with torch.no_grad():
            logits = po(f, torch.from_numpy(ref_toks[:, :c]))[:, -1, :].numpy()
        top2 = np.sort(logits[r])[-2:]
        gap = float(top2[1] - top2[0])
        assert gap < 1e-4, (
            f"greedy diverged at row {r} step {c} with a decisive "
            f"top1-top2 gap of {gap:.2e} (not a near-tie)")

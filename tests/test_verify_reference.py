"""The reference-checkpoint parity readiness command proves itself
(cli/verify_reference.py --self_test): fabricated reference-style .pt
checkpoints + synthetic bundle must pass all four stages — lossless
convert round-trip, greedy token parity vs the eager-torch oracle,
faithful-beam dump byte-diff, and metric-score diff."""

import numpy as np
import pytest

import jax

from image_captioning_through_rl_tpu.cli import verify_reference as vr


@pytest.mark.slow
def test_self_test_all_stages_pass(capsys):
    assert vr.main(["--self_test"]) == 0
    out = capsys.readouterr().out
    assert out.count("[PASS]") >= 7  # 4 converts + greedy + diff + score
    assert "[FAIL]" not in out


def test_torch_greedy_oracle_matches_framework(rng_np):
    """The script's inline eager-torch greedy oracle (reference
    trainers.py:57-70 semantics) agrees with the framework decode on
    exported weights — the core of stage 2, without the eval cost."""
    from image_captioning_through_rl_tpu.config import NetConfig
    from image_captioning_through_rl_tpu.decode import greedy_decode
    from image_captioning_through_rl_tpu.models import policy
    from image_captioning_through_rl_tpu.models.convert import policy_to_torch

    cfg = NetConfig(vocab_size=33, input_dim=12, wordvec_dim=10,
                    hidden_dim=14, max_seq_len=8)
    pp = policy.init(jax.random.PRNGKey(0), cfg)
    feats = rng_np.standard_normal((9, 12)).astype(np.float32)
    start = np.ones(9, np.int32)
    ours = np.asarray(greedy_decode(pp, cfg, feats, start))
    oracle = vr._torch_greedy(policy_to_torch(pp), feats, start,
                              cfg.max_seq_len)
    np.testing.assert_array_equal(ours, oracle)


def test_find_pt_prefers_bidirectional_suffix(tmp_path):
    for name in ("policyNetwork.pt", "policyNetwork_bidirectional.pt",
                 "a2cNetwork.pt"):
        (tmp_path / name).write_bytes(b"x")
    uni = vr._find_pt(str(tmp_path), bidirectional=False)
    bi = vr._find_pt(str(tmp_path), bidirectional=True)
    assert uni["policy"].endswith("policyNetwork.pt")
    assert bi["policy"].endswith("policyNetwork_bidirectional.pt")
    assert bi["a2c"].endswith("a2cNetwork.pt")  # falls back to plain

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


def test_missing_checkpoints_fail_staged_not_keyerror(tmp_path, capsys):
    """A models_dir lacking a2cNetwork.pt (mistyped path, partial copy)
    must produce staged [FAIL]/[SKIP] lines and exit code 1 — never a
    raw KeyError after the earlier stages already printed."""
    from image_captioning_through_rl_tpu.config import NetConfig
    from image_captioning_through_rl_tpu.data import (load_data,
                                                      make_synthetic_coco)
    from image_captioning_through_rl_tpu.models import policy
    from image_captioning_through_rl_tpu.train.checkpoint import (
        save_network_pt)

    fixture = make_synthetic_coco(
        str(tmp_path / "coco"), num_train_images=4, num_val_images=8,
        vocab_size=23, feature_dim=8, seed=5)
    data = load_data(fixture)
    cfg = NetConfig.for_vocab(data.word_to_idx, None, input_dim=8,
                              wordvec_dim=6, hidden_dim=8)
    models = tmp_path / "models"
    models.mkdir()
    pp = policy.init(jax.random.PRNGKey(0), cfg)
    save_network_pt("policy", pp, str(models / "policyNetwork.pt"))

    rc = vr.main(["--models_dir", str(models), "--data_dir", fixture,
                  "--out_dir", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] eval dump" in out and "a2cNetwork.pt" in out
    assert "[SKIP] beam-dump byte-diff" in out
    assert "[SKIP] score diff" in out
    # an EMPTY models dir fails the convert stage the same staged way
    empty = tmp_path / "empty"
    empty.mkdir()
    rc = vr.main(["--models_dir", str(empty), "--data_dir", fixture,
                  "--out_dir", str(tmp_path / "out2")])
    assert rc == 1
    assert "[FAIL] convert" in capsys.readouterr().out


def test_score_diff_handles_results_without_dict_line(tmp_path, capsys):
    """A results*.txt with no '{...}' line reports FAIL, not
    StopIteration (the reference format is one repr'd dict line)."""
    (tmp_path / "results_non-curr.txt").write_text("scores: none here\n")
    real = tmp_path / "real.txt"
    gen = tmp_path / "gen.txt"
    real.write_text("a cat\n")
    gen.write_text("a cat\n")
    icd = {"real_captions_path": str(real),
           "generated_captions_path": str(gen)}
    assert vr.verify_score_diff(icd, str(tmp_path)) is False
    assert "[FAIL] score diff" in capsys.readouterr().out

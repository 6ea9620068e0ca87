"""Eval-path quirks Q8/Q9: with-replacement draws and 127-wide slices."""

import numpy as np

import jax

from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig
from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
from image_captioning_through_rl_tpu.models import a2c
from image_captioning_through_rl_tpu.train.loops import test_a2c_network as eval_a2c_network


def test_eval_slice_widths_and_line_counts(tmp_path, monkeypatch):
    """data_size=20 with validation_batch_size=8 must produce slices of
    width 7 (Q9: [i : i + vbs - 1]) and dump exactly 7+7+6(pad-trimmed)
    = 20 - floor(20/8) lines... precisely: slices at 0,8,16 of widths
    7,7,4 => 18 lines (every 8th sample dropped)."""
    coco = make_synthetic_coco(str(tmp_path / "coco"), num_val_images=10,
                               vocab_size=30, feature_dim=16, seed=9)
    data = load_data(coco)
    cfg = NetConfig(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8, max_seq_len=6)
    params = a2c.init(jax.random.PRNGKey(0), cfg)

    paths = {
        "real_captions_path": str(tmp_path / "real.txt"),
        "generated_captions_path": str(tmp_path / "gen.txt"),
        "image_urls_path": str(tmp_path / "urls.txt"),
    }
    eval_a2c_network(
        params, cfg, data, paths, data_size=20, validation_batch_size=8,
        dcfg=DecodeConfig(beam_size=2, max_seq_len=6), seed=0,
    )
    gen = [l for l in open(paths["generated_captions_path"]).read().splitlines() if l]
    real = [l for l in open(paths["real_captions_path"]).read().splitlines() if l]
    # 20 draws in stride-8 slices of width 7: 7 + 7 + 4 = 18 (Q9 drop)
    assert len(gen) == len(real) == 18
    assert all(l.split()[0] == "<START>" for l in gen)


def test_eval_draws_with_replacement(tmp_path):
    """Q8: data_size larger than the val split must still work (draws are
    with replacement)."""
    coco = make_synthetic_coco(str(tmp_path / "coco"), num_val_images=3,
                               vocab_size=30, feature_dim=16, seed=10)
    data = load_data(coco)  # val split has 6 captions
    cfg = NetConfig(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8, max_seq_len=6)
    params = a2c.init(jax.random.PRNGKey(1), cfg)
    paths = {
        "real_captions_path": str(tmp_path / "real.txt"),
        "generated_captions_path": str(tmp_path / "gen.txt"),
        "image_urls_path": str(tmp_path / "urls.txt"),
    }
    eval_a2c_network(
        params, cfg, data, paths, data_size=12, validation_batch_size=8,
        dcfg=DecodeConfig(beam_size=2, max_seq_len=6), seed=0,
    )
    real = [l for l in open(paths["real_captions_path"]).read().splitlines() if l]
    assert len(real) == 7 + 4  # 12 draws, Q9 slicing

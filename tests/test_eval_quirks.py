"""Eval-path quirks Q8/Q9: with-replacement draws and 127-wide slices."""

import pytest
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


def test_eval_compat_dump_merges_slice_boundaries(tmp_path):
    """Q13: the reference writes each slice with no trailing newline
    (trainers.py:652-654), merging the last line of slice i with the
    first line of slice i+1 — merged line count = items - slices + 1
    (its shipped 40k dump is 39,871 lines). Default stays clean."""
    coco = make_synthetic_coco(str(tmp_path / "coco"), num_val_images=10,
                               vocab_size=30, feature_dim=16, seed=11)
    data = load_data(coco)
    cfg = NetConfig(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8, max_seq_len=6)
    params = a2c.init(jax.random.PRNGKey(2), cfg)

    def run(sub, compat_dump):
        paths = {
            "real_captions_path": str(tmp_path / sub / "real.txt"),
            "generated_captions_path": str(tmp_path / sub / "gen.txt"),
            "image_urls_path": str(tmp_path / sub / "urls.txt"),
        }
        (tmp_path / sub).mkdir()
        eval_a2c_network(
            params, cfg, data, paths, data_size=20, validation_batch_size=8,
            dcfg=DecodeConfig(beam_size=2, max_seq_len=6), seed=0,
            compat_dump=compat_dump,
        )
        return paths

    # 20 draws -> Q9 slices of widths 7, 7, 4 = 18 items over 3 slices
    clean = run("clean", compat_dump=False)
    merged = run("compat", compat_dump=True)
    for key in ("real_captions_path", "generated_captions_path", "image_urls_path"):
        clean_lines = open(clean[key]).read().splitlines()
        merged_lines = open(merged[key]).read().splitlines()
        assert len(clean_lines) == 18
        assert len(merged_lines) == 18 - 3 + 1  # items - slices + 1
    # ref and hypo files merge at the same offsets, keeping lines aligned
    real_m = open(merged["real_captions_path"]).read().splitlines()
    gen_m = open(merged["generated_captions_path"]).read().splitlines()
    assert len(real_m) == len(gen_m)
    # the merged boundary lines contain two caption terminators
    real_c = open(clean["real_captions_path"]).read().splitlines()
    assert real_m[6] == real_c[6] + real_c[7]


@pytest.mark.slow
def test_eval_faithful_mode_runs_tail_unpadded(tmp_path):
    """Faithful (batch-mean) decode couples the whole slice (Q2a), so the
    ragged tail must run at its exact size — padded duplicates would
    vote in the shared beam ranking (r1 advisor finding)."""
    coco = make_synthetic_coco(str(tmp_path / "coco"), num_val_images=10,
                               vocab_size=30, feature_dim=16, seed=12)
    data = load_data(coco)
    cfg = NetConfig(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8, max_seq_len=6)
    params = a2c.init(jax.random.PRNGKey(3), cfg)
    paths = {
        "real_captions_path": str(tmp_path / "real.txt"),
        "generated_captions_path": str(tmp_path / "gen.txt"),
        "image_urls_path": str(tmp_path / "urls.txt"),
    }
    eval_a2c_network(
        params, cfg, data, paths, data_size=20, validation_batch_size=8,
        dcfg=DecodeConfig(beam_size=2, max_seq_len=6, per_sample_beams=False),
        seed=0,
    )
    gen = [l for l in open(paths["generated_captions_path"]).read().splitlines() if l]
    assert len(gen) == 18

    # oracle: the faithful stateful beam on the exact 4-wide tail slice
    from image_captioning_through_rl_tpu.data.coco import decode_captions, get_coco_batch
    from image_captioning_through_rl_tpu.decode import beam_search_compat

    rng = np.random.default_rng(0 + 5)  # the eval draw (seed + 5)
    caps_all, feats_all, _ = get_coco_batch(data, batch_size=20, split="val", rng=rng)
    dcfg = DecodeConfig(beam_size=2, max_seq_len=6, per_sample_beams=False)
    toks, _, _ = beam_search_compat(
        params["policy"], params["value"], cfg, dcfg,
        jax.numpy.asarray(feats_all[16:20]), jax.numpy.asarray(caps_all[16:20, 0]),
    )
    want = decode_captions(np.asarray(toks[:, 0]), data.idx_to_word)
    assert gen[-4:] == want


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


def test_eval_forced_fused_flag_conflicts_raise(tmp_path):
    """use_fused_kernel=True must error in faithful/bidirectional/mesh
    modes instead of silently serving a different program — the same
    forced-flag contract the trainers and api.Captioner enforce."""
    import pytest

    from image_captioning_through_rl_tpu.parallel import make_mesh

    coco = make_synthetic_coco(str(tmp_path / "coco"), num_val_images=6,
                               vocab_size=30, feature_dim=16, seed=2)
    data = load_data(coco)
    cfg = NetConfig(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8,
                    max_seq_len=6)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    paths = {
        "real_captions_path": str(tmp_path / "real.txt"),
        "generated_captions_path": str(tmp_path / "gen.txt"),
        "image_urls_path": str(tmp_path / "urls.txt"),
    }
    common = dict(data_size=8, validation_batch_size=8,
                  seed=0, use_fused_kernel=True)
    with pytest.raises(ValueError, match="faithful"):
        eval_a2c_network(params, cfg, data, paths,
                         dcfg=DecodeConfig(beam_size=2, max_seq_len=6,
                                           per_sample_beams=False), **common)
    with pytest.raises(ValueError, match="mesh"):
        eval_a2c_network(params, cfg, data, paths, mesh=make_mesh(),
                         dcfg=DecodeConfig(beam_size=2, max_seq_len=6), **common)

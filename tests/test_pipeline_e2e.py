"""End-to-end pipeline smoke: the full CLI flow on a synthetic fixture.

Runs train (all four networks, tiny sizes) -> test (beam decode + dumps)
-> score -> reload-from-checkpoint -> re-test, exercising the same
call sequence the reference drives from image_captioner.py:93-151.
"""

import os
import types

import numpy as np
import pytest

from image_captioning_through_rl_tpu.cli.main import main
from image_captioning_through_rl_tpu.data import make_synthetic_coco


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    return make_synthetic_coco(
        str(tmp_path_factory.mktemp("coco")),
        num_train_images=12, num_val_images=6, captions_per_image=2,
        vocab_size=40, feature_dim=32, seed=11,
    )


def _args(coco_dir, workdir, **over):
    # start from the REAL parser's defaults so this test cannot drift
    # from the CLI flag surface (new flags pick up their defaults here)
    from image_captioning_through_rl_tpu.cli.main import build_arg_parser

    base = vars(build_arg_parser().parse_args([]))
    base.update(
        training_size=0, test_size=10, epochs=1, batch_size=8,
        retrain=True, test_model="",
        pretrained_path=os.path.join(workdir, "models_pretrained"),
        data_dir=coco_dir, seed=0,
    )
    base.update(over)
    return types.SimpleNamespace(**base)


@pytest.mark.slow
def test_full_pipeline_train_test_score_reload(coco_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # -- feature-dim-32 fixture needs a matching NetConfig; shrink nets for speed
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig

    def tiny_cfg(data, bidirectional, net_dims=None):
        return NetConfig.for_vocab(
            data.word_to_idx, data.embeddings, bidirectional=bidirectional,
            input_dim=32, wordvec_dim=16, hidden_dim=16,
        )

    monkeypatch.setattr(loops, "_cfg_for", tiny_cfg)

    main(_args(coco_dir, str(tmp_path)))

    # artifacts in the timestamped log dir
    logs = os.listdir("logs")
    assert len(logs) == 1
    log_dir = os.path.join("logs", logs[0])
    files = set(os.listdir(log_dir))
    assert "real_captions.txt" in files
    assert "generated_captions.txt" in files
    assert "image_url.txt" in files
    assert "results.txt" in files
    assert "a2cNetwork.ckpt" in files
    # run provenance: the resolved flag set rides with the artifacts
    import json as _json
    with open(os.path.join(log_dir, "run_config.json")) as f:
        assert _json.load(f)["epochs"] == 1
    with open(os.path.join(log_dir, "results.txt")) as f:
        results = f.read()
    assert "Bleu_1" in results and "CIDEr" in results
    with open(os.path.join(log_dir, "generated_captions.txt")) as f:
        gen_lines = [l for l in f.read().splitlines() if l]
    assert len(gen_lines) > 0
    assert all(l.startswith("<START>") for l in gen_lines)

    # sub-network checkpoints written to the pretrained dir
    pretrained = set(os.listdir(os.path.join(str(tmp_path), "models_pretrained")))
    assert {"rewardNetwork.ckpt", "policyNetwork.ckpt", "valueNetwork.ckpt",
            "a2cNetwork.ckpt"} <= pretrained

    # -- reload path: --test_model skips training entirely; --postprocess
    # exercises the scoring/top-k/download branch (downloads mocked)
    import urllib.request

    downloads = []
    monkeypatch.setattr(
        urllib.request, "urlretrieve", lambda url, fn: downloads.append(url)
    )
    main(_args(coco_dir, str(tmp_path), postprocess=True,
               test_model=os.path.join(log_dir, "a2cNetwork.ckpt"), retrain=False))
    # eval appended more generated lines into the same log dir
    with open(os.path.join(log_dir, "generated_captions.txt")) as f:
        assert len([l for l in f.read().splitlines() if l]) > len(gen_lines) - 1
    # postprocess artifacts: best_scores.txt + attempted downloads
    with open(os.path.join(log_dir, "best_scores.txt")) as f:
        best = [l for l in f.read().splitlines() if l]
    assert 0 < len(best) <= 5
    assert all(l.startswith("item_index[") for l in best)
    assert len(downloads) == len(best)


@pytest.mark.slow
def test_curriculum_pipeline(coco_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import importlib

    cli_main = importlib.import_module("image_captioning_through_rl_tpu.cli.main")
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig

    def tiny_cfg(data, bidirectional, net_dims=None):
        return NetConfig.for_vocab(
            data.word_to_idx, data.embeddings, bidirectional=bidirectional,
            input_dim=32, wordvec_dim=16, hidden_dim=16,
        )

    monkeypatch.setattr(loops, "_cfg_for", tiny_cfg)
    monkeypatch.setattr(cli_main, "CURRICULUM_LEVELS", [3])

    main(_args(coco_dir, str(tmp_path), curriculum=True))
    logs = os.listdir("logs")
    log_dir = os.path.join("logs", sorted(logs)[0])
    files = set(os.listdir(log_dir))
    # curriculum suffix naming (utilities.py:326-338)
    assert "a2cNetwork_curriculum.ckpt" in files
    assert "results_curriculum.txt" in files
    assert "generated_captions_curriculum.txt" in files


def test_setup_falls_back_to_reference_pt_filenames(tmp_path, monkeypatch):
    """--pretrained_path pointed at a reference-style models_pretrained/
    dir (only .pt files) must resolve network_paths to the .pt files so
    the torch converter loads them (checkpoint.py docstring,
    reference image_captioner.py:26-29)."""
    monkeypatch.chdir(tmp_path)
    from image_captioning_through_rl_tpu.cli.main import setup

    mp = tmp_path / "models_pretrained"
    mp.mkdir()
    for name in ("policyNetwork.pt", "valueNetwork.pt", "rewardNetwork.pt"):
        (mp / name).write_bytes(b"stub")
    (mp / "a2cNetwork.ckpt").write_bytes(b"stub")  # native file wins when present

    args = _args("unused", str(tmp_path))
    _, _, _, network_paths = setup(args)
    assert network_paths["policy_network"].endswith("policyNetwork.pt")
    assert network_paths["value_network"].endswith("valueNetwork.pt")
    assert network_paths["reward_network"].endswith("rewardNetwork.pt")
    assert network_paths["a2c_network"].endswith("a2cNetwork.ckpt")


@pytest.mark.slow
def test_spmd_pipeline(coco_dir, tmp_path, monkeypatch):
    """--spmd drives the whole CLI flow over the 8-virtual-device mesh:
    mesh-threaded trainers (GlobalBatcher path), sharded eval decode,
    scoring — same artifact set as the single-device run."""
    monkeypatch.chdir(tmp_path)
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig

    def tiny_cfg(data, bidirectional, net_dims=None):
        return NetConfig.for_vocab(
            data.word_to_idx, data.embeddings, bidirectional=bidirectional,
            input_dim=32, wordvec_dim=16, hidden_dim=16,
        )

    monkeypatch.setattr(loops, "_cfg_for", tiny_cfg)

    main(_args(coco_dir, str(tmp_path), spmd=True))

    logs = os.listdir("logs")
    assert len(logs) == 1
    log_dir = os.path.join("logs", logs[0])
    files = set(os.listdir(log_dir))
    assert {"real_captions.txt", "generated_captions.txt", "image_url.txt",
            "results.txt", "a2cNetwork.ckpt"} <= files
    with open(os.path.join(log_dir, "results.txt")) as f:
        assert "CIDEr" in f.read()
    with open(os.path.join(log_dir, "generated_captions.txt")) as f:
        gen_lines = [l for l in f.read().splitlines() if l]
    assert gen_lines and all(l.startswith("<START>") for l in gen_lines)

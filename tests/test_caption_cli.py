"""End-to-end images -> captions CLI (cli/caption.py) and the
FeatureExtractor / Captioner.caption_images API surface."""

import json
import os

import numpy as np
import pytest

import jax

from image_captioning_through_rl_tpu.api import (
    Captioner,
    FeatureExtractor,
    load_feature_extractor,
)
from image_captioning_through_rl_tpu.cli import caption as caption_cli
from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.data.pca import PCAProjection
from image_captioning_through_rl_tpu.models import a2c, policy, value
from image_captioning_through_rl_tpu.train import checkpoint as ckpt

VOCAB = ["<NULL>", "<START>", "<END>", "<UNK>"] + [f"w{i}" for i in range(26)]


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    """A self-contained model dir: vocab json, PCA npz (4096 -> 8),
    policy/value/a2c checkpoints at the CLI's default shapes for 8-d
    input, and two tiny images."""
    d = tmp_path_factory.mktemp("caption_cli")
    vocab_path = d / "coco2014_vocab.json"
    vocab_path.write_text(json.dumps({
        "word_to_idx": {w: i for i, w in enumerate(VOCAB)},
        "idx_to_word": VOCAB,
    }))

    rng = np.random.default_rng(0)
    proj = PCAProjection(
        np.zeros(4096, np.float32),
        rng.standard_normal((4096, 8)).astype(np.float32) * 0.01,
    )
    proj.save(str(d / "pca.npz"))

    cfg = NetConfig.for_vocab({w: i for i, w in enumerate(VOCAB)}, input_dim=8)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    ckpt.save_pytree(params["policy"], str(d / "policyNetwork.ckpt"))
    ckpt.save_pytree(params["value"], str(d / "valueNetwork.ckpt"))
    ckpt.save_pytree(params, str(d / "a2cNetwork.ckpt"))

    from PIL import Image

    img_dir = d / "imgs"
    img_dir.mkdir()
    for i in range(2):
        arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
    return d


@pytest.mark.slow
def test_caption_images_cli_end_to_end(pipeline_dir, capsys):
    d = pipeline_dir
    imgs = sorted(str(p) for p in (d / "imgs").iterdir())
    out = d / "captions.txt"
    caption_cli.main(imgs + [
        "--model", str(d / "a2cNetwork.ckpt"),
        "--vocab", str(d / "coco2014_vocab.json"),
        "--pca", str(d / "pca.npz"),
        "--out", str(out),
    ])
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 2
    for line, img in zip(lines, imgs):
        path, cap = line.split("\t")
        assert path == img
        assert all(w in VOCAB for w in cap.split())


@pytest.mark.slow
def test_caption_cli_beam_and_dir_input(pipeline_dir, capsys):
    d = pipeline_dir
    caption_cli.main([
        "--images_dir", str(d / "imgs"),
        "--model", str(d / "a2cNetwork.ckpt"),
        "--vocab", str(d),  # directory form resolves coco2014_vocab.json
        "--pca", str(d / "pca.npz"),
        "--beam_size", "2",
    ])
    outlines = [l for l in capsys.readouterr().out.strip().split("\n")
                if "[Caption]" not in l]  # info banner shares stdout
    assert len(outlines) == 2 and all("\t" in l for l in outlines)


def test_caption_cli_missing_images_errors(pipeline_dir):
    d = pipeline_dir
    with pytest.raises(SystemExit):
        caption_cli.main([
            "--model", str(d / "a2cNetwork.ckpt"),
            "--vocab", str(d / "coco2014_vocab.json"),
        ])
    with pytest.raises(SystemExit):
        caption_cli.main([
            str(d / "nope.jpg"),
            "--model", str(d / "a2cNetwork.ckpt"),
            "--vocab", str(d / "coco2014_vocab.json"),
        ])


@pytest.mark.slow
def test_feature_extractor_dim_and_mismatch_error(pipeline_dir):
    d = pipeline_dir
    ext = load_feature_extractor(pca=str(d / "pca.npz"))
    assert ext.dim == 8
    assert load_feature_extractor().dim == 4096

    # captioner trained on a different input dim -> clear error
    cfg = NetConfig.for_vocab({w: i for i, w in enumerate(VOCAB)},
                              input_dim=16, wordvec_dim=8, hidden_dim=8)
    params = a2c.init(jax.random.PRNGKey(1), cfg)
    cap = Captioner(params, cfg, {i: w for i, w in enumerate(VOCAB)})
    imgs = np.zeros((1, 32, 32, 3), np.uint8)
    with pytest.raises(ValueError, match="PCA"):
        cap.caption_images(imgs, ext)


@pytest.mark.slow
def test_caption_cli_vgg_bf16_end_to_end(pipeline_dir, capsys):
    d = pipeline_dir
    caption_cli.main([
        "--images_dir", str(d / "imgs"),
        "--model", str(d / "a2cNetwork.ckpt"),
        "--vocab", str(d / "coco2014_vocab.json"),
        "--pca", str(d / "pca.npz"),
        "--vgg_bf16",
    ])
    outlines = [l for l in capsys.readouterr().out.strip().split("\n")
                if "[Caption]" not in l]
    assert len(outlines) == 2 and all("\t" in l for l in outlines)


@pytest.mark.slow
def test_feature_extractor_bf16_casts_once_and_stays_close(pipeline_dir):
    """bf16=True casts the VGG tree to bfloat16 at construction (one
    cast, not per call) and yields f32 features near the f32 path."""
    import jax.numpy as jnp

    d = pipeline_dir
    f32 = load_feature_extractor(pca=str(d / "pca.npz"))
    b16 = load_feature_extractor(pca=str(d / "pca.npz"), bf16=True)
    for leaf in jax.tree.leaves(b16.vgg_params):
        assert leaf.dtype == jnp.bfloat16
    paths = sorted(str(p) for p in (d / "imgs").iterdir())
    a = f32(paths, batch_size=2)
    b = b16(paths, batch_size=2)
    assert b.dtype == np.float32 and b.shape == a.shape
    denom = np.abs(a).mean() + 1e-6
    assert np.abs(b - a).mean() / denom < 0.1


def test_feature_extractor_array_input_matches_path_input(pipeline_dir):
    """Path-loader input and pre-decoded array input produce identical
    features for the same pixels (224-crop geometry)."""
    from PIL import Image

    from image_captioning_through_rl_tpu.cli.extract import load_image_batch

    d = pipeline_dir
    paths = sorted(str(p) for p in (d / "imgs").iterdir())
    ext = load_feature_extractor(pca=str(d / "pca.npz"))
    via_paths = ext(paths, batch_size=2)
    via_array = ext(load_image_batch(paths), batch_size=2)
    np.testing.assert_allclose(via_paths, via_array, rtol=2e-5, atol=2e-5)
    assert via_paths.shape == (2, 8)


@pytest.mark.slow
def test_caption_cli_sampling(pipeline_dir, capsys):
    """--sample: seeded stochastic decode from the CLI; --num_samples
    emits one line per draw, reproducible under the same seed."""
    d = pipeline_dir
    imgs = sorted(str(p) for p in (d / "imgs").iterdir())
    args = imgs + [
        "--model", str(d / "a2cNetwork.ckpt"),
        "--vocab", str(d / "coco2014_vocab.json"),
        "--pca", str(d / "pca.npz"),
        "--sample", "--temperature", "1.8", "--top_k", "6",
        "--num_samples", "3", "--sample_seed", "11",
    ]
    out_a, out_b = d / "sample_a.txt", d / "sample_b.txt"
    caption_cli.main(args + ["--out", str(out_a)])
    caption_cli.main(args + ["--out", str(out_b)])
    lines = out_a.read_text().strip().split("\n")
    assert len(lines) == 6  # 2 images x 3 draws, image-major
    assert [l.split("\t")[0] for l in lines] == [
        imgs[0]] * 3 + [imgs[1]] * 3
    for line in lines:
        assert all(w in VOCAB for w in line.split("\t")[1].split())
    assert out_a.read_text() == out_b.read_text()


def test_caption_cli_sample_beam_conflict(pipeline_dir):
    d = pipeline_dir
    imgs = sorted(str(p) for p in (d / "imgs").iterdir())
    with pytest.raises(SystemExit):
        caption_cli.main(imgs + [
            "--model", str(d / "a2cNetwork.ckpt"),
            "--vocab", str(d / "coco2014_vocab.json"),
            "--pca", str(d / "pca.npz"),
            "--sample", "--beam_size", "2",
        ])

"""VGG16 visual encoder: parity vs a hand-built torch VGG16, PCA."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.data.pca import PCAProjection, fit_pca
from image_captioning_through_rl_tpu.models import vgg, vgg_from_torch


def _torch_vgg16():
    """torchvision-architecture VGG16 (features + classifier through fc7)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for c in cfg:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, c, 3, padding=1), nn.ReLU(inplace=True)]
            in_ch = c
    features = nn.Sequential(*layers)
    classifier = nn.Sequential(
        nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
        nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
        nn.Linear(4096, 10),
    )

    class V(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.classifier = classifier

        def fc7(self, x):
            x = self.features(x)
            x = torch.flatten(x, 1)
            x = torch.relu(self.classifier[0](x))
            return torch.relu(self.classifier[3](x))

    return V()


@pytest.mark.slow
def test_fc7_matches_torch(rng_np):
    torch.manual_seed(0)
    oracle = _torch_vgg16().eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = vgg_from_torch(sd)

    imgs = rng_np.standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle.fc7(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got = vgg.features_fc7(params, jnp.asarray(imgs), precision="highest", preprocessed=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


def test_vgg_from_torch_returns_device_arrays():
    """Converted VGG params must be jax Arrays, not host numpy — numpy
    leaves are re-uploaded to the device on EVERY jit call (~528 MB of
    VGG16 weights per serving request over a tunneled chip)."""
    torch.manual_seed(1)
    sd = {k: v.numpy() for k, v in _torch_vgg16().state_dict().items()}
    params = vgg_from_torch(sd)
    for leaf in jax.tree.leaves(params):
        assert isinstance(leaf, jax.Array), type(leaf)


def test_preprocess_resizes_and_normalizes(rng_np):
    imgs = (rng_np.random((2, 300, 400, 3)) * 255).astype(np.uint8)
    out = vgg.preprocess(jnp.asarray(imgs))
    assert out.shape == (2, 224, 224, 3)
    # a mid-gray image maps near (0.5 - mean) / std
    gray = jnp.full((1, 50, 50, 3), 0.5, jnp.float32)  # floats are [0, 1]
    norm = vgg.preprocess(gray)
    expect = (0.5 - np.array(vgg.IMAGENET_MEAN)) / np.array(vgg.IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(norm[0, 0, 0]), expect, rtol=1e-2)


def test_init_and_forward_shapes():
    params = vgg.init(jax.random.PRNGKey(0))
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)  # preprocess resizes to 224
    out = vgg.features_fc7(params, imgs)
    assert out.shape == (1, 4096)


def test_pca_recovers_low_rank_structure(rng_np, tmp_path):
    basis = rng_np.standard_normal((5, 64)).astype(np.float32)
    coeff = rng_np.standard_normal((200, 5)).astype(np.float32)
    x = coeff @ basis + 0.7
    proj = fit_pca(jnp.asarray(x), k=5)
    z = proj.apply(jnp.asarray(x))
    assert z.shape == (200, 5)
    # 5 components capture a rank-5 dataset: reconstruction is near-exact
    recon = np.asarray(z) @ np.asarray(proj.components).T + np.asarray(proj.mean)
    np.testing.assert_allclose(recon, x, rtol=1e-3, atol=1e-3)
    # round-trip through disk
    proj.save(str(tmp_path / "pca.npz"))
    proj2 = PCAProjection.load(str(tmp_path / "pca.npz"))
    np.testing.assert_allclose(np.asarray(proj2.apply(jnp.asarray(x))), np.asarray(z), rtol=1e-5)


def test_extract_features_with_projection(rng_np):
    params = vgg.init(jax.random.PRNGKey(1))
    imgs = rng_np.standard_normal((5, 32, 32, 3)).astype(np.float32)
    raw = vgg.extract_features(params, imgs, batch_size=2)
    assert raw.shape == (5, 4096)
    proj = fit_pca(jnp.asarray(raw), k=4)
    compact = vgg.extract_features(params, imgs, batch_size=2, projection=proj)
    assert compact.shape == (5, 4)


def test_extract_features_shares_one_jitted_program():
    """extract_features must reuse ONE jitted fc7 program across calls —
    a fresh jit wrapper per call re-traces (and re-compiles, ~9 min on a
    remote-compile backend) the VGG16 conv stack every invocation."""
    from image_captioning_through_rl_tpu.models.vgg import _jitted_fc7

    assert _jitted_fc7() is _jitted_fc7()


def test_bf16_compute_path_close_to_f32(rng_np):
    """compute_dtype=bfloat16 halves HBM traffic; fc7 must stay f32 on
    the OUTSIDE (PCA bases are fitted in f32) and drift only at bf16
    rounding level relative to the f32 path."""
    params = vgg.init(jax.random.PRNGKey(2))
    imgs = rng_np.standard_normal((3, 32, 32, 3)).astype(np.float32)
    f32 = vgg.extract_features(params, imgs, batch_size=4)
    b16 = vgg.extract_features(params, imgs, batch_size=4,
                               compute_dtype=jnp.bfloat16)
    assert b16.dtype == np.float32
    assert b16.shape == f32.shape
    # bf16 has ~3 decimal digits; after 15 conv/fc layers expect a few %
    denom = np.abs(f32).mean() + 1e-6
    assert np.abs(b16 - f32).mean() / denom < 0.1


def test_cast_params_is_one_time_and_idempotent():
    params = vgg.init(jax.random.PRNGKey(3))
    half = vgg.cast_params(params, jnp.bfloat16)
    for leaf in jax.tree.leaves(half):
        assert leaf.dtype == jnp.bfloat16
    # Re-casting bf16->bf16 must not copy: jnp.asarray returns the same
    # buffer, so extract_features' defensive cast is free on the hot path.
    again = vgg.cast_params(half, jnp.bfloat16)
    for a, b in zip(jax.tree.leaves(half), jax.tree.leaves(again)):
        assert a is b


def test_jitted_fc7_caches_per_dtype():
    from image_captioning_through_rl_tpu.models.vgg import _jitted_fc7

    assert _jitted_fc7(None) is _jitted_fc7(None)
    assert _jitted_fc7(jnp.bfloat16) is _jitted_fc7(jnp.bfloat16)
    assert _jitted_fc7(None) is not _jitted_fc7(jnp.bfloat16)


@pytest.mark.slow
def test_pipelined_extraction_matches_per_batch_results(rng_np):
    """The async readback window (host loader / device compute overlap)
    must change nothing observable: more batches than _PIPELINE_DEPTH,
    a ragged tail, a loader, and a projection — rows come back in order
    and equal the single-batch forward."""
    from image_captioning_through_rl_tpu.models.vgg import _PIPELINE_DEPTH

    params = vgg.init(jax.random.PRNGKey(4))
    n_batches = _PIPELINE_DEPTH + 3
    imgs = rng_np.standard_normal((2 * n_batches - 1, 32, 32, 3)).astype(np.float32)

    calls = []

    def loader(chunk):
        calls.append(len(chunk))
        return np.asarray(chunk)

    proj = fit_pca(jnp.asarray(
        rng_np.standard_normal((40, 4096)).astype(np.float32)), k=6)
    got = vgg.extract_features(params, list(imgs), batch_size=2,
                               loader=loader, projection=proj)
    assert got.shape == (len(imgs), 6)
    assert calls == [2] * (n_batches - 1) + [1]  # order + ragged tail
    want = proj.apply(vgg.features_fc7(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_mesh_sharded_extraction_matches_single_device(rng_np):
    """mesh= shards each batch over the data axis; rows must come back
    identical (same program, same math — batch parallelism only)."""
    from image_captioning_through_rl_tpu.parallel import make_mesh

    params = vgg.init(jax.random.PRNGKey(5))
    imgs = rng_np.standard_normal((11, 32, 32, 3)).astype(np.float32)
    mesh = make_mesh((8,), ("data",))
    plain = vgg.extract_features(params, imgs, batch_size=8)
    sharded = vgg.extract_features(params, imgs, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(sharded, plain, rtol=2e-5, atol=2e-5)

    # a batch size below/off the data axis rounds UP to a multiple (a
    # 1-row serving bucket on an 8-chip mesh pads to 8 — it cannot
    # shard 1 row 8 ways); rows still come back identical
    small = vgg.extract_features(params, imgs, batch_size=6, mesh=mesh)
    np.testing.assert_allclose(small, plain, rtol=2e-5, atol=2e-5)
    one = vgg.extract_features(params, imgs[:3], batch_size=1, mesh=mesh)
    np.testing.assert_allclose(one, plain[:3], rtol=2e-5, atol=2e-5)


def test_mesh_sharded_extraction_rejects_multiprocess(monkeypatch):
    """Multi-host meshes must be refused with the file-list guidance —
    sharding one global pixel batch would ship images between hosts."""
    from image_captioning_through_rl_tpu.models import vgg as vgg_mod
    from image_captioning_through_rl_tpu.parallel import make_mesh
    from image_captioning_through_rl_tpu.parallel import sharding as sh

    params = vgg.init(jax.random.PRNGKey(6))
    mesh = make_mesh((8,), ("data",))
    monkeypatch.setattr(sh, "_spans_processes", lambda m: True)
    with pytest.raises(ValueError, match="file list"):
        vgg_mod.extract_features(
            params, np.zeros((8, 32, 32, 3), np.float32), batch_size=8,
            mesh=mesh)


@pytest.mark.slow
def test_iter_features_streams_blocks_matching_extract(rng_np):
    """iter_features yields in-order numpy blocks whose concatenation is
    exactly extract_features' table (padding sliced per block) — the
    bounded-memory path the h5-writing CLI consumes."""
    params = vgg.init(jax.random.PRNGKey(8))
    imgs = rng_np.standard_normal((7, 32, 32, 3)).astype(np.float32)
    blocks = list(vgg.iter_features(params, imgs, batch_size=3))
    assert [len(b) for b in blocks] == [3, 3, 1]  # ragged tail sliced
    assert all(isinstance(b, np.ndarray) for b in blocks)
    whole = vgg.extract_features(params, imgs, batch_size=3)
    np.testing.assert_allclose(np.concatenate(blocks), whole, rtol=1e-6)
    assert list(vgg.iter_features(params, imgs[:0], batch_size=3)) == []


def test_extract_features_empty_input():
    import jax
    import numpy as np

    from image_captioning_through_rl_tpu.models import vgg

    params = vgg.init(jax.random.PRNGKey(0))
    out = vgg.extract_features(params, np.zeros((0, 224, 224, 3), np.uint8))
    assert out.shape == (0, 4096)

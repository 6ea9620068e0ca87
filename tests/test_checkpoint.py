"""Checkpoint persistence: native round-trip, real torch .pt loading,
orbax backend, reference filename scheme."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import policy
from image_captioning_through_rl_tpu.train import checkpoint as ckpt
from image_captioning_through_rl_tpu.utils.io import get_filename

from torch_oracles import TorchPolicyOracle, rand_features

CFG = NetConfig(vocab_size=29, input_dim=12, wordvec_dim=14, hidden_dim=16, precision="highest")


def test_native_roundtrip(tmp_path):
    params = policy.init(jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "policyNetwork.ckpt")
    ckpt.save_pytree(params, path)
    template = policy.init(jax.random.PRNGKey(1), CFG)
    restored = ckpt.load_pytree(template, path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_real_torch_pt_file(tmp_path, rng_np):
    """A genuine torch.save()d .pt file must load and reproduce outputs."""
    oracle = TorchPolicyOracle(29, CFG.input_dim, CFG.wordvec_dim, CFG.hidden_dim)
    pt_path = str(tmp_path / "policyNetwork.pt")
    torch.save(oracle.state_dict(), pt_path)

    params = ckpt.load_network("policy", pt_path)
    feats = rand_features(rng_np, 4, CFG.input_dim)
    caps = np.ones((4, 5), dtype=np.int64)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(feats)[None], torch.from_numpy(caps)).numpy()
    got = policy.forward(params, CFG, jnp.asarray(feats), jnp.asarray(caps))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_load_network_native_requires_template(tmp_path):
    params = policy.init(jax.random.PRNGKey(2), CFG)
    path = str(tmp_path / "x.ckpt")
    ckpt.save_pytree(params, path)
    with pytest.raises(ValueError):
        ckpt.load_network("policy", path)


def test_save_to_paths_multiple(tmp_path):
    params = policy.init(jax.random.PRNGKey(3), CFG)
    p1, p2 = str(tmp_path / "a.ckpt"), str(tmp_path / "b" / "c.ckpt")
    ckpt.save_to_paths(params, [p1, p2])
    assert os.path.exists(p1) and os.path.exists(p2)


def test_orbax_roundtrip(tmp_path):
    params = policy.init(jax.random.PRNGKey(4), CFG)
    d = str(tmp_path / "orbax_ckpt")
    ckpt.save_orbax(params, d)
    template = policy.init(jax.random.PRNGKey(5), CFG)
    restored = ckpt.load_orbax(template, d)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("kind", ["policy", "value", "reward", "a2c"])
@pytest.mark.parametrize("bidi", [False, True])
def test_export_reimport_bit_exact(kind, bidi):
    """native params -> reference state dict -> native params is
    bit-exact for every network kind, both directions of the LSTM/GRU
    (the fused-LSTM-bias split exports as (b, 0), whose re-import sum
    restores b exactly)."""
    from image_captioning_through_rl_tpu.models import a2c, reward, value
    from image_captioning_through_rl_tpu.models.convert import to_torch_state_dict
    from image_captioning_through_rl_tpu.train.checkpoint import _CONVERTERS

    cfg = NetConfig(vocab_size=29, input_dim=12, wordvec_dim=14, hidden_dim=16,
                    bidirectional=bidi)
    mod = {"policy": policy, "value": value, "reward": reward, "a2c": a2c}[kind]
    params = mod.init(jax.random.PRNGKey(6), cfg)
    sd = to_torch_state_dict(kind, params, bidirectional=bidi)
    back = _CONVERTERS[kind](sd, bidi)
    la, lb = jax.tree.leaves(params), jax.tree.leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_pt_loads_into_torch_policy_strict(tmp_path, rng_np):
    """save_network_pt writes a real torch file the reference-layout
    policy module loads with strict=True, forward-equal to the native
    net — the full TPU-train -> torch-serve round trip."""
    params = policy.init(jax.random.PRNGKey(7), CFG)
    path = str(tmp_path / "policyNetwork.pt")
    ckpt.save_network_pt("policy", params, path)

    oracle = TorchPolicyOracle(29, CFG.input_dim, CFG.wordvec_dim, CFG.hidden_dim)
    oracle.load_state_dict(torch.load(path, weights_only=True), strict=True)

    feats = rand_features(rng_np, 4, CFG.input_dim)
    caps = np.ones((4, 5), dtype=np.int64)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(feats)[None], torch.from_numpy(caps)).numpy()
    got = policy.forward(params, CFG, jnp.asarray(feats), jnp.asarray(caps))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bidi", [False, True])
def test_export_value_reward_match_reference_layout(bidi):
    """Value/reward exports carry exactly the reference's key set and
    shapes: stripping the valrnn./rewrnn. submodule prefixes, they load
    strict=True into the reference-layout torch modules."""
    from torch_oracles import TorchRewardOracle, TorchValueOracle

    from image_captioning_through_rl_tpu.models import reward, value
    from image_captioning_through_rl_tpu.models.convert import to_torch_state_dict

    cfg = NetConfig(vocab_size=29, input_dim=12, wordvec_dim=14, hidden_dim=16,
                    bidirectional=bidi)
    for kind, mod, oracle_cls, prefix in (
        ("value", value, TorchValueOracle, "valrnn."),
        ("reward", reward, TorchRewardOracle, "rewrnn."),
    ):
        params = mod.init(jax.random.PRNGKey(8), cfg)
        sd = to_torch_state_dict(kind, params, bidirectional=bidi)
        stripped = {
            (k[len(prefix):] if k.startswith(prefix) else k): torch.from_numpy(np.array(v))
            for k, v in sd.items()
        }
        oracle = oracle_cls(29, cfg.input_dim, cfg.wordvec_dim, cfg.hidden_dim,
                            bidirectional=bidi)
        oracle.load_state_dict(stripped, strict=True)


def test_export_cli_roundtrip(tmp_path):
    """cli/export: native a2c .ckpt -> .pt; re-importing the file
    reproduces the original weights bit-for-bit."""
    import json

    from image_captioning_through_rl_tpu.cli import export as export_cli
    from image_captioning_through_rl_tpu.models import a2c
    from image_captioning_through_rl_tpu.models.convert import (
        a2c_from_torch,
        load_torch_state_dict,
    )

    words = ["<NULL>", "<START>", "<END>", "<UNK>"] + [f"w{i}" for i in range(25)]
    word_to_idx = {w: i for i, w in enumerate(words)}
    vocab_path = str(tmp_path / "coco2014_vocab.json")
    with open(vocab_path, "w") as f:
        json.dump({"word_to_idx": word_to_idx, "idx_to_word": words}, f)

    cfg = NetConfig.for_vocab(word_to_idx, input_dim=12, wordvec_dim=14,
                              hidden_dim=16)
    params = a2c.init(jax.random.PRNGKey(9), cfg)
    src = str(tmp_path / "a2cNetwork.ckpt")
    ckpt.save_pytree(params, src)
    dst = str(tmp_path / "a2cNetwork.pt")

    export_cli.main([src, dst, "--kind", "a2c", "--vocab", vocab_path,
                     "--input_dim", "12", "--wordvec_dim", "14",
                     "--hidden_dim", "16"])

    back = a2c_from_torch(load_torch_state_dict(dst))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_get_filename_scheme():
    assert get_filename("a2cNetwork.ckpt", False, None) == "a2cNetwork.ckpt"
    assert get_filename("a2cNetwork.ckpt", True, None) == "a2cNetwork_bidirectional.ckpt"
    assert get_filename("a2cNetwork.ckpt", True, True) == "a2cNetwork_bidirectional_curriculum.ckpt"
    assert get_filename("results.txt", False, True) == "results_curriculum.txt"
    assert get_filename("rewardNetwork.pt", False, False) == "rewardNetwork.pt"

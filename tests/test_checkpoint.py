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


def test_get_filename_scheme():
    assert get_filename("a2cNetwork.ckpt", False, None) == "a2cNetwork.ckpt"
    assert get_filename("a2cNetwork.ckpt", True, None) == "a2cNetwork_bidirectional.ckpt"
    assert get_filename("a2cNetwork.ckpt", True, True) == "a2cNetwork_bidirectional_curriculum.ckpt"
    assert get_filename("results.txt", False, True) == "results_curriculum.txt"
    assert get_filename("rewardNetwork.pt", False, False) == "rewardNetwork.pt"

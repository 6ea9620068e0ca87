"""SPMD data parallelism: batch-sharded decoding and a shard_map A2C
training step over a `jax.sharding.Mesh`.

The reference is strictly single-device (SURVEY §2); here the mesh is a
first-class argument everywhere. On a machine with one device this
script fabricates 8 virtual CPU devices so the collective paths really
execute — the same trick the test suite uses; on a real multi-chip TPU
slice just drop the env block and `make_mesh()` spans the slice.
"""
import os

import numpy as np

if not os.environ.get("ICRL_EXAMPLE_REAL_MESH"):
    # 8 virtual CPU devices; must happen before jax initializes its
    # backends. Set ICRL_EXAMPLE_REAL_MESH=1 on a multi-chip TPU slice
    # to span the real devices instead.
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.api import Captioner
from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c, reward
from image_captioning_through_rl_tpu.parallel import make_mesh, replicate, shard_batch
from image_captioning_through_rl_tpu.parallel.shard_map_step import (
    make_shard_map_a2c_step,
)
from image_captioning_through_rl_tpu.train import optim

mesh = make_mesh()  # 1-D "data" mesh over every visible device
print("mesh:", mesh)

cfg = NetConfig(vocab_size=50, input_dim=64, wordvec_dim=32, hidden_dim=32)
params = a2c.init(jax.random.PRNGKey(0), cfg)
idx_to_word = {i: f"word{i}" for i in range(cfg.vocab_size)}

# --- Sharded serving: pass the mesh to the Captioner and every decode
# family (greedy / beam / sampling) batch-shards over the data axis,
# token-exact vs single device.
cap = Captioner(params, cfg, idx_to_word, mesh=mesh)
feats = np.random.default_rng(7).standard_normal((16, 64), dtype=np.float32)
print("sharded greedy:", cap.caption(feats)[0])

# --- Sharded training: one A2C update as an explicit shard_map program
# (batch sharded, params replicated, grads psum-reduced across chips).
rparams = reward.init(jax.random.PRNGKey(1), cfg)
tx = optim.adam(1e-4)
step = make_shard_map_a2c_step(cfg, tx, mesh)

n = 16 * len(jax.devices())
feats_np = np.random.default_rng(1).standard_normal((n, 64), dtype=np.float32)
caps_np = np.ones((n, cfg.max_seq_len), np.int32)
caps_np[:, 5] = 2  # <END>
feats_s, caps_s = shard_batch(mesh, jnp.asarray(feats_np), jnp.asarray(caps_np))
params_r, rparams_r = replicate(mesh, params), replicate(mesh, rparams)
opt_r = replicate(mesh, tx.init(params))

params_r, opt_r, stats = step(params_r, opt_r, rparams_r, feats_s, caps_s,
                              jnp.int32(1), jax.random.PRNGKey(2))
print("sharded A2C step: loss =", float(stats.loss))

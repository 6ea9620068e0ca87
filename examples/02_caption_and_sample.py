"""Decoding surfaces: greedy, value-guided beam, and stochastic
sampling through the high-level `Captioner` (reference decode loops:
trainers.py:57-70 greedy, trainers.py:73-105 beam).

Uses randomly-initialized weights so it runs standalone; load real ones
with `api.load_captioner(model_path, data, network_paths)` (native
.ckpt or reference .pt both work).
"""
import os

if os.environ.get("ICRL_EXAMPLE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

from image_captioning_through_rl_tpu.api import Captioner
from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c

cfg = NetConfig(vocab_size=50, input_dim=64, wordvec_dim=32, hidden_dim=32)
params = a2c.init(jax.random.PRNGKey(0), cfg)
idx_to_word = {i: f"word{i}" for i in range(cfg.vocab_size)}
idx_to_word.update({0: "<NULL>", 1: "<START>", 2: "<END>", 3: "<UNK>"})

cap = Captioner(params, cfg, idx_to_word)
feats = np.random.default_rng(7).standard_normal((4, 64), dtype=np.float32)

print("greedy:    ", cap.caption(feats)[0])
print("beam-5:    ", cap.caption(feats, beam_size=5)[0])
for i, s in enumerate(cap.sample_captions(feats[:1], num_samples=3,
                                          temperature=0.9, top_k=10, seed=1)[0]):
    print(f"sample #{i}: ", s)

# Token-level access (ids rather than text):
toks = cap.caption_tokens(feats)            # [N, T] int32
print("token matrix:", toks.shape, toks.dtype)

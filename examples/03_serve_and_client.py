"""HTTP serving round trip: start a `CaptionServer` on a free port,
query it with the stdlib `CaptionClient` (binary dense-feature wire
format — the measured-fastest path, docs/SERVING.md), and shut down.

Production deployments use the blocking CLI instead:
    python -m image_captioning_through_rl_tpu.server --model ... --port 8000
"""
import os

if os.environ.get("ICRL_EXAMPLE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

from image_captioning_through_rl_tpu.api import Captioner
from image_captioning_through_rl_tpu.client import CaptionClient
from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c
from image_captioning_through_rl_tpu.server import CaptionServer

cfg = NetConfig(vocab_size=50, input_dim=64, wordvec_dim=32, hidden_dim=32)
params = a2c.init(jax.random.PRNGKey(0), cfg)
idx_to_word = {i: f"word{i}" for i in range(cfg.vocab_size)}

srv = CaptionServer(Captioner(params, cfg, idx_to_word), port=0)  # 0: free port
srv.start()
try:
    srv.warmup(cfg.input_dim, beam_sizes=(0, 3), buckets=(8,))  # pre-compile
    client = CaptionClient(f"http://127.0.0.1:{srv.port}")

    feats = np.random.default_rng(3).standard_normal((2, 64), dtype=np.float32)
    print("greedy: ", client.caption(feats))
    print("beam-3: ", client.caption(feats, beam_size=3))
    print("sampled:", client.caption(
        feats[:1], sample={"temperature": 0.9, "top_k": 10, "seed": 4}))
finally:
    srv.stop()

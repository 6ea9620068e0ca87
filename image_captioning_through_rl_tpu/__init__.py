"""image_captioning_through_rl_tpu — a TPU-native JAX framework for
deep-RL image captioning (actor-critic with a visual-semantic embedding
reward), re-designed from scratch for TPU hardware.

Capabilities mirror the reference implementation of Ren/Zhou et al.,
"Deep Reinforcement Learning-based Image Captioning with Embedding
Reward" (arXiv 1704.03899): an LSTM policy network pretrained with
cross-entropy, a value network (critic), a GRU visual-semantic-embedding
reward network, joint advantage-actor-critic training (optionally with a
curriculum schedule), greedy and value-guided beam-search decoding, and
BLEU/METEOR/ROUGE-L/CIDEr evaluation.

Design principles (TPU-first, not a port):
  * Parameters are plain pytrees; every model is a pure function.
  * Time loops are ``jax.lax.scan``; decode carries LSTM state so
    autoregressive generation is O(T), not the reference's O(T^2).
  * Sampling, reward scoring and advantage estimation stay on-chip.
  * Scaling is SPMD over a ``jax.sharding.Mesh`` (data and model axes)
    with XLA collectives — see :mod:`.parallel`.
  * Hot decode paths have fused Pallas kernels — see :mod:`.ops`.
"""

__version__ = "0.1.0"

MAX_SEQ_LEN = 17  # max caption length in the COCO bundle (reference models.py:18)

# Special vocabulary ids of the CS231n-style COCO captioning bundle
# (reference utilities.py:101-103 / metrics.py:33-34).
NULL_ID = 0
START_ID = 1
END_ID = 2
UNK_ID = 3

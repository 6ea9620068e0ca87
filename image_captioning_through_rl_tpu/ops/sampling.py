"""On-chip categorical sampling.

The reference samples rollout actions on the host with a Python loop of
``np.random.choice`` per batch element after a device->host copy
(reference trainers.py:445-450) — a per-step sync that dominates its A2C
step time. Here sampling is a single fused on-chip op so whole-batch
Monte-Carlo rollouts stay inside one ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_categorical(rng: jax.Array, logits: jax.Array, axis: int = -1) -> jax.Array:
    """Sample token ids from unnormalized ``logits`` via the Gumbel trick.

    Equivalent in distribution to ``np.random.choice(V, p=softmax(logits))``
    per row, but vectorized on the VPU with no host round-trip.
    """
    return jax.random.categorical(rng, logits, axis=axis)


def log_prob_of(logits: jax.Array, actions: jax.Array) -> jax.Array:
    """``log softmax(logits)[action]`` per row.

    ``logits: [N, V]``, ``actions: [N]`` -> ``[N]``. Computed with the
    numerically stable log-softmax rather than the reference's
    ``log(softmax(...)[action])`` (trainers.py:458); identical values in
    exact arithmetic.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, actions[:, None], axis=-1)[:, 0]

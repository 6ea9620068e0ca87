"""Parameter initializers matching the reference's torch defaults.

Matching the init *distributions* keeps training dynamics comparable to
the reference even though the frameworks differ:

  * ``nn.Embedding``: N(0, 1)                      (torch default)
  * ``nn.Linear``:    U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both w, b
    (kaiming_uniform(a=sqrt(5)) reduces to exactly this bound)
  * ``nn.LSTM``/``nn.GRU``: U(-1/sqrt(H), +1/sqrt(H)) for all tensors
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def embedding_init(rng: jax.Array, vocab: int, dim: int, dtype=jnp.float32) -> jax.Array:
    return jax.random.normal(rng, (vocab, dim), dtype=dtype)


def linear_init(rng: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32) -> dict:
    k = 1.0 / math.sqrt(fan_in)
    wk, bk = jax.random.split(rng)
    return {
        "w": jax.random.uniform(wk, (fan_in, fan_out), dtype, -k, k),
        "b": jax.random.uniform(bk, (fan_out,), dtype, -k, k),
    }


def lstm_init(rng: jax.Array, in_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    k = 1.0 / math.sqrt(hidden)
    ki, kh, kb1, kb2 = jax.random.split(rng, 4)
    # Single fused bias: the sum of torch's two U(-k, k) bias vectors.
    b = jax.random.uniform(kb1, (4 * hidden,), dtype, -k, k) + jax.random.uniform(
        kb2, (4 * hidden,), dtype, -k, k
    )
    return {
        "wi": jax.random.uniform(ki, (in_dim, 4 * hidden), dtype, -k, k),
        "wh": jax.random.uniform(kh, (hidden, 4 * hidden), dtype, -k, k),
        "b": b,
    }


def gru_init(rng: jax.Array, in_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    k = 1.0 / math.sqrt(hidden)
    ki, kh, kbi, kbh = jax.random.split(rng, 4)
    return {
        "wi": jax.random.uniform(ki, (in_dim, 3 * hidden), dtype, -k, k),
        "wh": jax.random.uniform(kh, (hidden, 3 * hidden), dtype, -k, k),
        "bi": jax.random.uniform(kbi, (3 * hidden,), dtype, -k, k),
        "bh": jax.random.uniform(kbh, (3 * hidden,), dtype, -k, k),
    }

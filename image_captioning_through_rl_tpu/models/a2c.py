"""Advantage actor-critic agent: the (value, policy) pair.

Mirrors the reference's ``AdvantageActorCriticNetwork`` wrapper
(models.py:265-287): values from the critic on the full prefix, action
logits from the actor's *last* timestep only. Parameters are a pytree
``{"value": ..., "policy": ...}`` matching the reference checkpoint's
``value_network.* / policy_network.*`` key prefixes.
"""

from __future__ import annotations

from typing import Tuple

import jax

from ..config import NetConfig
from . import policy as policy_mod
from . import value as value_mod


def init(rng: jax.Array, cfg: NetConfig, pretrained_embeddings=None) -> dict:
    kv, kp = jax.random.split(rng)
    return {
        "value": value_mod.init(kv, cfg, pretrained_embeddings),
        "policy": policy_mod.init(kp, cfg, pretrained_embeddings),
    }


def forward(
    params: dict, cfg: NetConfig, features: jax.Array, captions: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """``(values [N, 1], last-step logits [N, V])`` for the current prefix."""
    values = value_mod.forward(params["value"], cfg, features, captions)
    logits = policy_mod.forward(params["policy"], cfg, features, captions)[:, -1, :]
    return values, logits

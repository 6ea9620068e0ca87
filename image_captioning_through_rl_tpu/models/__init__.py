"""Model zoo: policy (actor), value (critic), reward (VSE), A2C agent.

Every model is a pair of pure functions ``init(rng, cfg) -> params`` and
``forward(params, cfg, ...) -> outputs`` over plain pytrees — no module
state, so everything composes with ``jit``/``grad``/``vmap``/``shard_map``.
"""

from . import a2c, policy, reward, value
from .convert import policy_from_torch, reward_from_torch, value_from_torch, a2c_from_torch

__all__ = [
    "a2c",
    "policy",
    "reward",
    "value",
    "policy_from_torch",
    "value_from_torch",
    "reward_from_torch",
    "a2c_from_torch",
]

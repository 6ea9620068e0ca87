"""Model zoo: policy (actor), value (critic), reward (VSE), A2C agent.

Every model is a pair of pure functions ``init(rng, cfg) -> params`` and
``forward(params, cfg, ...) -> outputs`` over plain pytrees — no module
state, so everything composes with ``jit``/``grad``/``vmap``/``shard_map``.

The reference's ``repackage_hidden`` (models.py:20-30, detaching hidden
states from autograd history) has no equivalent here by construction:
recurrent state is an explicit value threaded through pure functions, so
nothing ever carries gradient history across steps unless a trainer
deliberately keeps it inside one jitted loss.
"""

from . import a2c, policy, reward, value, vgg
from .convert import (
    a2c_from_torch,
    policy_from_torch,
    reward_from_torch,
    value_from_torch,
    vgg_from_torch,
)

__all__ = [
    "a2c",
    "policy",
    "reward",
    "value",
    "vgg",
    "policy_from_torch",
    "value_from_torch",
    "reward_from_torch",
    "a2c_from_torch",
    "vgg_from_torch",
]

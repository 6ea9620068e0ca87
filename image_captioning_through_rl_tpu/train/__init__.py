"""Training: jitted step functions, epoch drivers, optimizers, checkpoints."""

from . import checkpoint, optim, steps
from .loops import (
    a2c_curriculum_training,
    a2c_training,
    load_a2c_models,
    test_a2c_network,
    train_a2c_network,
    train_policy_network,
    train_reward_network,
    train_value_network,
)

__all__ = [
    "checkpoint",
    "optim",
    "steps",
    "train_reward_network",
    "train_policy_network",
    "train_value_network",
    "train_a2c_network",
    "a2c_training",
    "a2c_curriculum_training",
    "test_a2c_network",
    "load_a2c_models",
]

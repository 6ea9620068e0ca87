"""Explicit-collective data-parallel training steps via shard_map.

The default scaling path (sharding.py) lets jit's SPMD partitioner
derive the collectives from input shardings. This module is the
explicit alternative: ``shard_map`` runs the per-device program
directly and the gradient all-reduce is a hand-placed ``psum`` over the
``data`` axis — the same thing the partitioner inserts, but visible and
pinned. Useful when the automatic partitioner makes a bad choice, and
as the template for hybrid schemes (e.g. overlapping the psum with the
rollout via ppermute chains).

Interchangeability caveat: the deterministic math (losses, gradients,
updates) matches the auto-SPMD path, but rollout SAMPLING streams
differ by construction — the per-device key folds in the device index,
so the same global batch + key draws different trajectories here than
under ``steps.make_a2c_step``, and across different mesh sizes
(tests/test_shard_map_step.py compares the paths on a sampling-free
window). Pick one path per training run; do not swap mid-run expecting
an identical trajectory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import NetConfig
from ..train import steps as steps_mod


def make_shard_map_a2c_step(
    cfg: NetConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    per_step_mean: bool = False,
    data_axis: str = "data",
    fused: bool = False,
    interpret: bool = False,
):
    """A2C update as a shard_map program: batch sharded over ``data``,
    params/opt-state replicated, gradients psum-reduced explicitly.

    The per-device rng key folds in the device index so shards draw
    INDEPENDENT sampling streams (not the single-device program's
    stream — see the module docstring's interchangeability caveat).

    ``fused=True`` runs each shard's rollout through the Pallas kernels
    (ops/pallas_rollout.py) — data-parallel training of the custom
    kernel path, with the same explicit psum; ``interpret`` drives the
    kernels through the Pallas interpreter (CPU-mesh testing).
    """
    if fused:
        if cfg.bidirectional:
            raise ValueError("fused rollout is unidirectional only")
        rollout = functools.partial(
            steps_mod.a2c_rollout_loss_fused,
            block_n=32 if interpret else 128, interpret=interpret,
            weight_dtype=jnp.float32 if interpret else None,
        )
    else:
        rollout = (
            steps_mod.a2c_rollout_loss_full if cfg.bidirectional
            else steps_mod.a2c_rollout_loss
        )

    def per_device(a2c_params, opt_state, reward_params, features, captions,
                   curr_seq_len, caplen, rng):
        # features/captions here are this device's batch shard
        idx = jax.lax.axis_index(data_axis)
        key = jax.random.fold_in(rng, idx)
        (loss, stats), grads = jax.value_and_grad(rollout, has_aux=True)(
            a2c_params, cfg, reward_params, features, captions,
            curr_seq_len, caplen, key, per_step_mean=per_step_mean,
        )
        # explicit DP gradient all-reduce over ICI
        grads = jax.lax.pmean(grads, axis_name=data_axis)
        stats = jax.tree.map(lambda x: jax.lax.pmean(x, axis_name=data_axis), stats)
        updates, opt_state = tx.update(grads, opt_state, a2c_params)
        return optax.apply_updates(a2c_params, updates), opt_state, stats

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(data_axis), P(data_axis), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(a2c_params, opt_state, reward_params, features, captions, curr_seq_len, rng):
        caplen = jnp.max(steps_mod.batch_caption_lens(captions))
        return sharded(
            a2c_params, opt_state, reward_params, features, captions,
            curr_seq_len, caplen, rng,
        )

    return step

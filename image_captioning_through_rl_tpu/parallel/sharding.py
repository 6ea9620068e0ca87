"""Sharding placement helpers and parameter partition specs.

Training steps in :mod:`..train.steps` are ordinary jitted functions;
scaling them out is purely a matter of *input placement*: commit the
batch to a ``data``-sharded layout and the parameters to a replicated
(or tensor-parallel) layout, and jit's SPMD partitioner propagates the
shardings through the step, inserting the gradient all-reduce and any
vocab-axis collectives automatically. No step code changes.

Tensor-parallel specs shard the vocabulary axis — the only weight axis
that grows with the problem (V ~ 1004 in the COCO bundle but unbounded
in general): the embedding table ``[V, E]`` and output head ``[E, V]``
split over ``model``; the hidden-dim weights replicate.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spans_processes(mesh: Mesh) -> bool:
    """True when ``mesh`` contains devices of other processes —
    ``device_put`` cannot reach those; the per-process global-array path
    (:mod:`.hostbatch`) takes over."""
    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Commit arrays to a batch-sharded layout on ``mesh``.

    Multi-process meshes route through
    :class:`.hostbatch.GlobalBatcher` (each process uploads only its
    addressable shard); single-process meshes use ``device_put``.
    """
    if _spans_processes(mesh):
        from .hostbatch import GlobalBatcher

        return GlobalBatcher(mesh, axis).shard(*arrays)
    out = tuple(
        jax.device_put(a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))
        for a in arrays
    )
    return out if len(out) > 1 else out[0]


def _is_replicated_on(mesh: Mesh, x) -> bool:
    s = getattr(x, "sharding", None)
    return (isinstance(s, NamedSharding) and s.mesh == mesh
            and s.spec == P())


def replicate(mesh: Mesh, tree):
    """Commit a pytree to fully-replicated layout on ``mesh`` (every
    process contributes its identical local copy on multi-process
    meshes). Trees already committed to this mesh's replicated layout
    pass through untouched — serving calls replicate the same parameter
    pytree per request, and re-uploading ~40 MB per request would
    dominate the hot path."""
    if all(_is_replicated_on(mesh, x) for x in jax.tree.leaves(tree)):
        return tree
    if _spans_processes(mesh):
        from .hostbatch import GlobalBatcher

        return GlobalBatcher(mesh).replicate(tree)
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_params(mesh: Mesh, params, spec_tree):
    """Commit parameters to the layouts in ``spec_tree`` (PartitionSpecs)."""
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def _rep(tree):
    return jax.tree.map(lambda _: P(), tree)


def policy_param_spec(params, model_axis: str = "model"):
    """TP spec for the policy net: vocab-sharded embedding and head."""
    spec = _rep(params)
    spec["embedding"] = P(model_axis, None)
    spec["head"] = {"w": P(None, model_axis), "b": P(model_axis)}
    return spec


def value_param_spec(params, model_axis: str = "model"):
    spec = _rep(params)
    spec["embedding"] = P(model_axis, None)
    return spec


def reward_param_spec(params, model_axis: str = "model"):
    spec = _rep(params)
    spec["embedding"] = P(model_axis, None)
    return spec


def a2c_param_spec(params, model_axis: str = "model"):
    return {
        "policy": policy_param_spec(params["policy"], model_axis),
        "value": value_param_spec(params["value"], model_axis),
    }

"""Checkpoint persistence.

Native format: msgpack pytrees via ``flax.serialization`` — a single
self-contained file per network, mirroring the reference's
one-``state_dict``-per-file layout (utilities.py:286-296). Reference
``.pt`` files load transparently through the torch converter, so a user
can point the framework at an existing ``models_pretrained/`` directory
(BASELINE.json requirement).

Network names follow the reference filenames (image_captioner.py:26-29)
with ``.ckpt`` for the native format: ``rewardNetwork.ckpt`` etc.; the
``_bidirectional``/``_curriculum`` suffix logic is
:func:`..utils.io.get_filename`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..models import (
    a2c_from_torch,
    policy_from_torch,
    reward_from_torch,
    value_from_torch,
)

_CONVERTERS = {
    "policy": policy_from_torch,
    "value": value_from_torch,
    "reward": reward_from_torch,
    "a2c": a2c_from_torch,
}

from ..utils.io import atomic_write


def save_pytree(params, path: str) -> None:
    host = jax.tree.map(np.asarray, params)
    with atomic_write(path) as f:
        f.write(serialization.to_bytes(host))


def load_pytree(template, path: str):
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return jax.tree.map(jnp.asarray, restored)


def load_network(kind: str, path: str, template=None, bidirectional: bool = False):
    """Load a checkpoint of ``kind`` in either format.

    ``.pt`` -> torch-state-dict conversion; anything else -> native
    msgpack (requires ``template`` for structure).
    """
    if path.endswith(".pt"):
        from ..models.convert import load_torch_state_dict

        return _CONVERTERS[kind](load_torch_state_dict(path), bidirectional)
    if template is None:
        raise ValueError("loading a native checkpoint requires a params template")
    return load_pytree(template, path)


def save_network_pt(kind: str, params, path: str,
                    bidirectional: bool = False) -> None:
    """Export ``params`` as a genuine ``torch.save``d state dict in the
    reference's layout — the inverse of the ``.pt`` branch of
    :func:`load_network`, so TPU-trained weights load back into the
    eager-torch reference stack (``load_a2c_models``,
    utilities.py:299-323; the exports satisfy ``strict=True``).
    Atomic like :func:`save_pytree`."""
    import torch

    from ..models.convert import to_torch_state_dict

    # np.array copies: jax-backed buffers are non-writable views, which
    # torch.from_numpy rejects (undefined-behavior warning)
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in to_torch_state_dict(kind, params, bidirectional).items()}
    with atomic_write(path) as f:
        torch.save(sd, f)


def save_orbax(params, directory: str) -> None:
    """Save via Orbax (directory-based, async-capable, multi-host-safe).

    The msgpack format above is the default single-file format; Orbax is
    the production option for sharded multi-host checkpoints. (Note:
    on tunneled single-chip dev backends Orbax's async machinery can
    stall — prefer the msgpack default there.)
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), jax.tree.map(np.asarray, params), force=True)
    ckptr.wait_until_finished()


def load_orbax(template, directory: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(directory), target=jax.tree.map(np.asarray, template))
    return jax.tree.map(jnp.asarray, restored)


def save_to_paths(params, save_paths) -> None:
    """Save to one path or a list of paths (reference save_a2c_model,
    utilities.py:286-296 — A2C saves go to both the log dir and the
    pretrained-models dir, trainers.py:384,498)."""
    if isinstance(save_paths, (list, tuple)):
        for p in save_paths:
            save_pytree(params, p)
    else:
        save_pytree(params, save_paths)

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


# ---- full training-state snapshots (exact resume) ----
#
# The reference's resume story is weights-only: an interrupted A2C run
# restarts from the per-epoch weight checkpoint with FRESH Adam moments,
# a FRESH RNG stream and epoch 0 (trainers.py:338-370 reloads
# sub-networks; nothing restores optimizer or sampler state). A train
# state snapshot additionally carries the optimizer state, both RNG
# streams (the numpy batch-sampling generator and the jax rollout key),
# and the loop position, so a resumed run continues BIT-IDENTICALLY to
# the uninterrupted one (tests/test_resume.py proves equality of every
# weight, both Adam moments and the logged scalars).

_TRAIN_STATE_VERSION = 1


def _key_data(key):
    """``(raw uint32 data, impl name or None)`` for either legacy or
    typed jax PRNG keys — the impl name rides in the payload so restore
    can re-wrap symmetrically (a typed key restored as bare uint32 data
    would break ``jax.random.split`` in the resumed loop)."""
    if jnp.issubdtype(getattr(key, "dtype", None), jax.dtypes.prng_key):
        return (np.asarray(jax.random.key_data(key)),
                str(jax.random.key_impl(key)))
    return np.asarray(key), None


def _restore_key(data, impl):
    k = jnp.asarray(data)
    return jax.random.wrap_key_data(k, impl=impl) if impl else k


def save_train_state(path: str, params, opt_state, key, meta: dict) -> None:
    """Atomically snapshot the full training state.

    ``meta`` must be JSON-serializable; numpy's ``Generator`` state dict
    (``rng.bit_generator.state``) qualifies — its 128-bit PCG64 state
    integers exceed msgpack's int range, which is why ``meta`` rides as
    a JSON string inside the msgpack payload.
    """
    import json

    key_data, key_impl = _key_data(key)
    meta = dict(meta, version=_TRAIN_STATE_VERSION, key_impl=key_impl)
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, opt_state),
        "key": key_data,
        "meta": json.dumps(meta),
    }
    with atomic_write(path) as f:
        f.write(serialization.to_bytes(payload))


def train_state_from_bytes(data: bytes, params_template, opt_state_template,
                           meta_check=None):
    """Parse a :func:`save_train_state` payload (split out from
    :func:`load_train_state` so multi-host resume can broadcast the raw
    file bytes once and parse identically on every rank).

    ``meta_check(meta)`` runs BEFORE the pytrees restore, so a snapshot
    of the wrong network raises the caller's diagnosis rather than a
    template-structure mismatch from the deserializer.
    """
    import json

    raw = serialization.msgpack_restore(data)
    meta = json.loads(raw["meta"])
    if meta.get("version") != _TRAIN_STATE_VERSION:
        raise ValueError(
            f"train-state version {meta.get('version')!r} is not the "
            f"supported {_TRAIN_STATE_VERSION}")
    if meta_check is not None:
        meta_check(meta)
    _check_state_shapes(params_template, raw["params"])
    return {
        "params": jax.tree.map(
            jnp.asarray,
            serialization.from_state_dict(params_template, raw["params"])),
        "opt_state": jax.tree.map(
            jnp.asarray,
            serialization.from_state_dict(opt_state_template,
                                          raw["opt_state"])),
        "key": _restore_key(raw["key"], meta.get("key_impl")),
        "meta": meta,
    }


def _check_state_shapes(template, restored) -> None:
    """Raise a clear architecture diagnosis when a snapshot's param
    shapes disagree with the run's config (``from_state_dict`` copies
    without shape checks, so e.g. ``--resume --hidden_dim 256`` against
    a 512-dim snapshot would otherwise restore wrong-shaped params and
    fail opaquely deep in jit tracing)."""
    tmpl = serialization.to_state_dict(template)

    def walk(t, r, path):
        if isinstance(t, dict):
            for k in t:
                if isinstance(r, dict) and k in r:
                    walk(t[k], r[k], path + (k,))
            return
        ts, rs = np.shape(t), np.shape(r)
        if ts != rs:
            name = "/".join(path)
            raise ValueError(
                f"train-state param {name!r} has shape {rs}, but this "
                f"run's architecture expects {ts} — the snapshot was "
                f"taken with different network dims (check --input_dim/"
                f"--wordvec_dim/--hidden_dim/--bidirectional and the "
                f"vocabulary)")

    walk(tmpl, restored, ())


def load_train_state(path: str, params_template, opt_state_template,
                     meta_check=None):
    with open(path, "rb") as f:
        data = f.read()
    return train_state_from_bytes(data, params_template, opt_state_template,
                                  meta_check)


def save_to_paths(params, save_paths) -> None:
    """Save to one path or a list of paths (reference save_a2c_model,
    utilities.py:286-296 — A2C saves go to both the log dir and the
    pretrained-models dir, trainers.py:384,498)."""
    if isinstance(save_paths, (list, tuple)):
        for p in save_paths:
            save_pytree(params, p)
    else:
        save_pytree(params, save_paths)

"""Convert reference PyTorch checkpoints into framework pytrees.

The reference persists each network with ``torch.save(state_dict())``
(utilities.py:286-296, trainers.py:184,246,295). This module maps those
state dicts onto our parameter pytrees so reference checkpoints load and
reproduce captions. Key facts about the layouts:

  * torch ``nn.Linear`` stores ``weight [out, in]`` — we store ``[in, out]``,
    so Linear weights transpose.
  * torch LSTM/GRU store ``weight_ih_l0 [G*H, in]`` / ``weight_hh_l0
    [G*H, H]`` with gate order i,f,g,o (LSTM) / r,z,n (GRU) — the same
    gate order we use, so conversion is transposition only.
  * torch keeps two bias vectors; our LSTM fuses them (``b = b_ih + b_hh``
    — algebraically identical since both add into the pre-activation).
    The GRU keeps them separate (the candidate gate applies ``r``
    between them).

Loading the ``.pt`` file itself requires torch (CPU build is enough);
conversion from an already-materialized ``{name: ndarray}`` mapping has
no torch dependency.
"""

from __future__ import annotations

import functools
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _as_device_pytree(fn):
    """Converters return jnp arrays so pytrees drop straight into jit."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        return jax.tree.map(jnp.asarray, fn(*args, **kwargs))

    return wrapped


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def load_torch_state_dict(path: str) -> dict:
    """Load a ``.pt`` state dict into a ``{name: np.ndarray}`` mapping."""
    import torch  # local import: core framework does not require torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in state.items()}


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {
        "w": np.ascontiguousarray(_np(sd[f"{prefix}.weight"]).T),
        "b": _np(sd[f"{prefix}.bias"]),
    }


def _lstm(sd: Mapping[str, np.ndarray], prefix: str, reverse: bool = False) -> dict:
    sfx = "_reverse" if reverse else ""
    return {
        "wi": np.ascontiguousarray(_np(sd[f"{prefix}.weight_ih_l0{sfx}"]).T),
        "wh": np.ascontiguousarray(_np(sd[f"{prefix}.weight_hh_l0{sfx}"]).T),
        "b": _np(sd[f"{prefix}.bias_ih_l0{sfx}"]) + _np(sd[f"{prefix}.bias_hh_l0{sfx}"]),
    }


def _gru(sd: Mapping[str, np.ndarray], prefix: str, reverse: bool = False) -> dict:
    sfx = "_reverse" if reverse else ""
    return {
        "wi": np.ascontiguousarray(_np(sd[f"{prefix}.weight_ih_l0{sfx}"]).T),
        "wh": np.ascontiguousarray(_np(sd[f"{prefix}.weight_hh_l0{sfx}"]).T),
        "bi": _np(sd[f"{prefix}.bias_ih_l0{sfx}"]),
        "bh": _np(sd[f"{prefix}.bias_hh_l0{sfx}"]),
    }


def _strip_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if not out:
        raise KeyError(f"no keys with prefix {prefix!r} in state dict")
    return out


@_as_device_pytree
def policy_from_torch(sd: Mapping[str, np.ndarray], bidirectional: bool = False) -> dict:
    params = {
        "embedding": _np(sd["caption_embedding.weight"]),
        "cnn2linear": _linear(sd, "cnn2linear"),
        "head": _linear(sd, "linear2vocab"),
    }
    if bidirectional:
        params["lstm_fwd"] = _lstm(sd, "lstm")
        params["lstm_bwd"] = _lstm(sd, "lstm", reverse=True)
    else:
        params["lstm"] = _lstm(sd, "lstm")
    return params


@_as_device_pytree
def value_from_torch(sd: Mapping[str, np.ndarray], bidirectional: bool = False) -> dict:
    params = {
        "embedding": _np(sd["valrnn.caption_embedding.weight"]),
        "linear1": _linear(sd, "linear1"),
        "linear2": _linear(sd, "linear2"),
    }
    if bidirectional:
        params["lstm_fwd"] = _lstm(sd, "valrnn.lstm")
        params["lstm_bwd"] = _lstm(sd, "valrnn.lstm", reverse=True)
        params["rnn_linear"] = _linear(sd, "rnn_linear")
    else:
        params["lstm"] = _lstm(sd, "valrnn.lstm")
    return params


@_as_device_pytree
def reward_from_torch(sd: Mapping[str, np.ndarray], bidirectional: bool = False) -> dict:
    params = {
        "embedding": _np(sd["rewrnn.caption_embedding.weight"]),
        "visual_embed": _linear(sd, "visual_embed"),
        "semantic_embed": _linear(sd, "semantic_embed"),
    }
    if bidirectional:
        params["gru_fwd"] = _gru(sd, "rewrnn.gru")
        params["gru_bwd"] = _gru(sd, "rewrnn.gru", reverse=True)
    else:
        params["gru"] = _gru(sd, "rewrnn.gru")
    return params


_VGG16_CONV_IDXS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


@_as_device_pytree
def vgg_from_torch(sd: Mapping[str, np.ndarray]) -> dict:
    """Convert a torchvision-layout VGG16 state dict to our pytree.

    torchvision keys: ``features.{i}.weight`` (OIHW) for the 13 convs at
    the Sequential indices above, ``classifier.{0,3}.*`` for fc6/fc7
    (fc8 ``classifier.6`` is dropped — only features are extracted).
    Conv kernels transpose OIHW -> HWIO for NHWC convolution.
    """
    params = {}
    for conv_id, i in enumerate(_VGG16_CONV_IDXS):
        w = _np(sd[f"features.{i}.weight"])  # [O, I, H, W]
        params[f"conv{conv_id}"] = {
            "w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "b": _np(sd[f"features.{i}.bias"]),
        }
    params["fc6"] = _linear(sd, "classifier.0")
    params["fc7"] = _linear(sd, "classifier.3")
    return params


@_as_device_pytree
def a2c_from_torch(sd: Mapping[str, np.ndarray], bidirectional: bool = False) -> dict:
    """Convert the joint A2C checkpoint (key prefixes ``value_network.* /
    policy_network.*`` from the wrapper's attribute names, reference
    models.py:279-280)."""
    return {
        "value": value_from_torch(_strip_prefix(sd, "value_network."), bidirectional),
        "policy": policy_from_torch(_strip_prefix(sd, "policy_network."), bidirectional),
    }

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


# --- the inverse direction: native pytrees -> reference state dicts ---
#
# Exports TPU-trained weights as the exact ``state_dict()`` layouts the
# reference's modules load (``load_a2c_models``, utilities.py:299-323,
# with ``strict=False`` — but these exports satisfy strict=True), so a
# reference user can round-trip: train here, ``torch.load`` there.
# Re-importing an export through the ``*_from_torch`` converters is
# bit-exact (the only non-unique mapping is the fused LSTM bias, which
# exports as ``(b_ih=b, b_hh=0)`` — torch sums the two into the same
# pre-activation, so the forward is identical and the re-import sum
# restores ``b`` exactly).


def _host(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _linear_to_torch(p: Mapping[str, np.ndarray], prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(_host(p["w"]).T)
    out[f"{prefix}.bias"] = _host(p["b"])


def _lstm_to_torch(p, prefix: str, out: dict, reverse: bool = False) -> None:
    sfx = "_reverse" if reverse else ""
    out[f"{prefix}.weight_ih_l0{sfx}"] = np.ascontiguousarray(_host(p["wi"]).T)
    out[f"{prefix}.weight_hh_l0{sfx}"] = np.ascontiguousarray(_host(p["wh"]).T)
    out[f"{prefix}.bias_ih_l0{sfx}"] = _host(p["b"])
    out[f"{prefix}.bias_hh_l0{sfx}"] = np.zeros_like(_host(p["b"]))


def _gru_to_torch(p, prefix: str, out: dict, reverse: bool = False) -> None:
    sfx = "_reverse" if reverse else ""
    out[f"{prefix}.weight_ih_l0{sfx}"] = np.ascontiguousarray(_host(p["wi"]).T)
    out[f"{prefix}.weight_hh_l0{sfx}"] = np.ascontiguousarray(_host(p["wh"]).T)
    out[f"{prefix}.bias_ih_l0{sfx}"] = _host(p["bi"])
    out[f"{prefix}.bias_hh_l0{sfx}"] = _host(p["bh"])


def policy_to_torch(params: Mapping, bidirectional: bool = False) -> dict:
    sd = {"caption_embedding.weight": _host(params["embedding"])}
    _linear_to_torch(params["cnn2linear"], "cnn2linear", sd)
    _linear_to_torch(params["head"], "linear2vocab", sd)
    if bidirectional:
        _lstm_to_torch(params["lstm_fwd"], "lstm", sd)
        _lstm_to_torch(params["lstm_bwd"], "lstm", sd, reverse=True)
    else:
        _lstm_to_torch(params["lstm"], "lstm", sd)
    return sd


def value_to_torch(params: Mapping, bidirectional: bool = False) -> dict:
    sd = {"valrnn.caption_embedding.weight": _host(params["embedding"])}
    _linear_to_torch(params["linear1"], "linear1", sd)
    _linear_to_torch(params["linear2"], "linear2", sd)
    if bidirectional:
        _lstm_to_torch(params["lstm_fwd"], "valrnn.lstm", sd)
        _lstm_to_torch(params["lstm_bwd"], "valrnn.lstm", sd, reverse=True)
        _linear_to_torch(params["rnn_linear"], "rnn_linear", sd)
    else:
        _lstm_to_torch(params["lstm"], "valrnn.lstm", sd)
    return sd


def reward_to_torch(params: Mapping, bidirectional: bool = False) -> dict:
    sd = {"rewrnn.caption_embedding.weight": _host(params["embedding"])}
    _linear_to_torch(params["visual_embed"], "visual_embed", sd)
    _linear_to_torch(params["semantic_embed"], "semantic_embed", sd)
    if bidirectional:
        _gru_to_torch(params["gru_fwd"], "rewrnn.gru", sd)
        _gru_to_torch(params["gru_bwd"], "rewrnn.gru", sd, reverse=True)
    else:
        _gru_to_torch(params["gru"], "rewrnn.gru", sd)
    return sd


def a2c_to_torch(params: Mapping, bidirectional: bool = False) -> dict:
    sd = {}
    for k, v in value_to_torch(params["value"], bidirectional).items():
        sd[f"value_network.{k}"] = v
    for k, v in policy_to_torch(params["policy"], bidirectional).items():
        sd[f"policy_network.{k}"] = v
    return sd


_TO_TORCH = {
    "policy": policy_to_torch,
    "value": value_to_torch,
    "reward": reward_to_torch,
    "a2c": a2c_to_torch,
}


def to_torch_state_dict(kind: str, params: Mapping,
                        bidirectional: bool = False) -> dict:
    """``{name: np.ndarray}`` in the reference layout for ``kind`` in
    ``policy | value | reward | a2c``."""
    try:
        fn = _TO_TORCH[kind]
    except KeyError:
        raise ValueError(f"unknown network kind {kind!r} "
                         f"(expected one of {sorted(_TO_TORCH)})") from None
    return fn(params, bidirectional)

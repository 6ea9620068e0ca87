"""Thin linear-algebra helpers.

All matmuls in the framework flow through :func:`matmul` so a single
switch controls MXU precision: the TPU MXU natively multiplies in
bfloat16; parity tests against float32 oracles request
``precision="highest"`` while production paths default to the fast mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PRECISIONS = {
    None: None,
    "default": None,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def resolve_precision(precision):
    """Map a user-friendly precision name to a ``jax.lax.Precision``."""
    if isinstance(precision, jax.lax.Precision):
        return precision
    return _PRECISIONS[precision]


def matmul(a: jax.Array, b: jax.Array, precision=None) -> jax.Array:
    """``a @ b`` with an explicit MXU precision knob."""
    return jnp.matmul(a, b, precision=resolve_precision(precision))


def dense(x: jax.Array, layer: dict, precision=None) -> jax.Array:
    """Apply an affine layer ``{'w': [in, out], 'b': [out]}``.

    Weights are stored input-major (``[in, out]``) — the transpose of
    torch's ``nn.Linear`` layout — so the forward pass is a plain
    ``x @ w`` that XLA tiles directly onto the MXU.
    """
    y = matmul(x, layer["w"], precision=precision)
    if "b" in layer and layer["b"] is not None:
        y = y + layer["b"]
    return y

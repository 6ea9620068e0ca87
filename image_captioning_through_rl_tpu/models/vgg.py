"""VGG16 visual encoder: raw images -> fc7 features.

The reference consumes *precomputed* VGG16 fc7 features from the
CS231n COCO bundle ({train,val}2014_vgg16_fc7[_pca].h5 —
utilities.py:61-73) and contains no CNN. A standalone framework must be
able to produce those features itself, so this module implements the
VGG16 architecture (Simonyan & Zisserman 2014: conv3x3 stacks
64-64 / 128-128 / 256x3 / 512x3 / 512x3 with 2x2 maxpool, then
fc6(4096) -> fc7(4096)) in JAX, with:

  * :func:`preprocess` — XLA-compiled resize + ImageNet normalization,
    fusing the input path into the same jit as the conv stack;
  * :func:`features_fc7` — the 4096-d fc7 activations (post-ReLU, the
    convention of the CS231n extraction);
  * :func:`init` for training from scratch and
    :func:`~.convert.vgg_from_torch` for torchvision-layout ``.pt``
    weights (pretrained weights are an input artifact, like the
    reference's .h5 files — this environment has no network egress to
    fetch them).

Layout is NHWC (TPU-native); torchvision weights (OIHW) are transposed
on conversion. Pair with :mod:`..data.pca` to reproduce the bundle's
512-d PCA features.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..ops.linalg import dense
from .initializers import linear_init

# channels per conv block; "M" = 2x2 maxpool (VGG configuration D)
_CFG: List = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def init(rng: jax.Array, dtype=jnp.float32) -> dict:
    """Kaiming-uniform init of the conv stack + fc6/fc7 (fc8 omitted:
    only features are needed)."""
    params: Dict[str, dict] = {}
    keys = jax.random.split(rng, len([c for c in _CFG if c != "M"]) + 2)
    k = 0
    in_ch = 3
    conv_id = 0
    for c in _CFG:
        if c == "M":
            continue
        fan_in = 3 * 3 * in_ch
        lin = linear_init(keys[k], fan_in, c, dtype)
        params[f"conv{conv_id}"] = {
            "w": lin["w"].reshape(3, 3, in_ch, c),  # HWIO
            "b": lin["b"],
        }
        in_ch = c
        conv_id += 1
        k += 1
    params["fc6"] = linear_init(keys[k], 512 * 7 * 7, 4096, dtype)
    params["fc7"] = linear_init(keys[k + 1], 4096, 4096, dtype)
    return params


def preprocess(images: jax.Array, size: int = 224) -> jax.Array:
    """uint8/float RGB ``[N, H, W, 3]`` -> normalized ``[N, 224, 224, 3]``.

    Bilinear resize + ImageNet mean/std normalization, all inside XLA so
    it fuses with the conv stack under one jit.
    """
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    n = x.shape[0]
    x = jax.image.resize(x, (n, size, size, 3), method="bilinear")
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def _conv_stack(params: dict, x: jax.Array, precision=None) -> jax.Array:
    conv_id = 0
    for c in _CFG:
        if c == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        p = params[f"conv{conv_id}"]
        x = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        ) + p["b"]
        x = jax.nn.relu(x)
        conv_id += 1
    return x  # [N, 7, 7, 512]


def cast_params(params: dict, dtype) -> dict:
    """One-time dtype cast of the whole parameter tree (e.g. to
    ``jnp.bfloat16`` for the half-bandwidth inference path). Done
    OUTSIDE the jitted forward so the f32 master copy is not re-read
    and re-cast on every batch (~0.5 GB of weights)."""
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)


def features_fc7(params: dict, images: jax.Array, precision=None,
                 preprocessed: bool = False, compute_dtype=None) -> jax.Array:
    """fc7 features ``[N, 4096]`` from raw or preprocessed images.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs the conv/fc stack
    with activations in that dtype; ``params`` must already be cast to
    match (:func:`cast_params`). The MXU multiplies in bf16 either way
    (XLA default precision), so this changes only the HBM traffic of
    activations and weight reads — accumulation stays f32 inside the
    MXU. Output is always f32.
    """
    x = images if preprocessed else preprocess(images)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    x = _conv_stack(params, x, precision=precision)
    # torch flattens NCHW; match that element order so converted
    # torchvision fc6 weights line up: NHWC -> NCHW -> flat
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    x = jax.nn.relu(dense(x, params["fc6"], precision=precision))
    x = jax.nn.relu(dense(x, params["fc7"], precision=precision))
    return x.astype(jnp.float32)


import functools


@functools.lru_cache(maxsize=4)
def _jitted_fc7(compute_dtype=None):
    """ONE jitted fc7 program per process (per compute dtype). A fresh
    ``jax.jit(lambda)`` per extract_features call would key the jit
    cache on the new wrapper and re-trace/re-compile the VGG16 conv
    stack every invocation (~9 minutes per remote compile on a tunneled
    chip). Params flow as a jit ARGUMENT: closing over them would embed
    hundreds of MB of constants in the compile payload."""
    return jax.jit(
        lambda p, im: features_fc7(p, im, compute_dtype=compute_dtype))


# In-flight batches the extraction loop keeps un-read-back so the host
# loader (PIL decode) and the device conv stack overlap; see
# extract_features. 4 batches bound device-held inputs to ~150 MB at
# batch 64 while comfortably covering loader/compute jitter.
_PIPELINE_DEPTH = 4


def iter_features(params: dict, images, batch_size: int = 64,
                  projection=None, loader=None, progress=None,
                  compute_dtype=None, mesh=None):
    """Streaming variant of :func:`extract_features`: yields numpy
    feature blocks (one per batch, in input order, padding already
    sliced off) instead of materializing the whole ``[N, dim]`` table.
    Memory stays bounded by the pipeline window regardless of N — the
    h5-writing CLI consumes this so million-image datasets never hold
    their features in RAM. Same pipelining, padding, bf16, and mesh
    semantics as :func:`extract_features` (which is this plus one
    concatenate)."""
    import numpy as np

    fn = _jitted_fc7(compute_dtype)
    if compute_dtype is not None:
        params = cast_params(params, compute_dtype)
    if mesh is not None:
        # Shard each padded batch over the mesh's data axis — VGG16 is
        # embarrassingly batch-parallel, parameters replicate (~0.5 GB,
        # well under HBM), XLA partitions the conv stack with no
        # cross-chip traffic beyond the launch. Single-controller
        # multi-chip only: a multi-HOST job should extract its own
        # process-local file list instead of sharding one global one
        # (each shard's pixels would have to be shipped between hosts).
        from ..parallel.sharding import _spans_processes, replicate, shard_batch

        if _spans_processes(mesh):
            raise ValueError(
                "extract_features(mesh=...) shards over the chips of one "
                "process; in a multi-host job give each process its own "
                "file list instead of sharding a global batch")
        # every chip needs equal rows: round the compiled batch shape up
        # to a multiple of the data axis (a batch_size=1 serving bucket
        # on an 8-chip mesh pads to 8 — you cannot shard 1 row 8 ways)
        data = mesh.shape["data"]
        batch_size = -(-batch_size // data) * data
        # replicate() passes through trees already committed to this
        # mesh (FeatureExtractor commits once at construction); only
        # direct callers pay the broadcast, once per call
        params = replicate(mesh, params)
    n = images.shape[0] if hasattr(images, "shape") else len(images)
    if n == 0:
        return iter(())

    # Host/device pipelining: JAX dispatch is async, so the host decodes
    # batch i+1 (the ``loader`` call — PIL work that owns the CPU) while
    # the device convolves batch i — PROVIDED nothing forces a readback
    # in between. Results stay device arrays behind a small in-flight
    # window and convert to numpy only once the window slides past them
    # (bounds device-resident inputs to _PIPELINE_DEPTH batches, ~150 MB
    # at batch 64). A per-batch np.asarray here would serialize the two
    # timelines.
    def blocks():
        pending = []  # (device feats, real row count) not yet read back
        starts = range(0, n, batch_size)
        if progress is not None:
            starts = progress(starts)
        for i in starts:
            chunk = images[i : i + batch_size]
            batch = np.asarray(chunk if loader is None else loader(chunk))
            real = batch.shape[0]
            if real < batch_size:  # pad: one compiled shape per batch
                pad = np.repeat(batch[-1:], batch_size - real, axis=0)
                batch = np.concatenate([batch, pad], axis=0)
            if mesh is None:
                feats = fn(params, jnp.asarray(batch))
            else:
                with mesh:
                    feats = fn(params, shard_batch(mesh, jnp.asarray(batch)))
            if projection is not None:
                feats = projection.apply(feats)
            pending.append((feats, real))
            if len(pending) > _PIPELINE_DEPTH:
                f, r = pending.pop(0)
                yield np.asarray(f)[:r]
        for f, r in pending:
            yield np.asarray(f)[:r]

    return blocks()


def extract_features(params: dict, images, batch_size: int = 64,
                     projection=None, loader=None, progress=None,
                     compute_dtype=None, mesh=None):
    """Batched jitted feature extraction over a large image collection,
    returned as one ``[N, dim]`` array.

    ``images`` is either an image array ``[N, H, W, 3]`` or, with
    ``loader``, any sequence whose slices ``loader`` turns into such an
    array (e.g. file paths — the CLI's decode-on-host path). The final
    ragged batch is padded up to ``batch_size`` by repeating its last
    item so the conv stack compiles exactly once (a second remote VGG16
    compile costs ~9 minutes on a tunneled chip). ``projection``
    (optional PCA from :mod:`..data.pca`) maps fc7 to the bundle's
    compact features. ``progress`` optionally wraps the batch iterator
    (e.g. tqdm). ``mesh`` shards batches over its ``data`` axis;
    ``compute_dtype`` runs the stack in that dtype (see
    :func:`features_fc7`). For collections whose feature table should
    not live in RAM, consume :func:`iter_features` instead.
    """
    import numpy as np

    blocks = list(iter_features(
        params, images, batch_size=batch_size, projection=projection,
        loader=loader, progress=progress, compute_dtype=compute_dtype,
        mesh=mesh))
    if not blocks:
        dim = (int(projection.components.shape[1])
               if projection is not None else 4096)
        return np.zeros((0, dim), np.float32)
    return np.concatenate(blocks, axis=0)

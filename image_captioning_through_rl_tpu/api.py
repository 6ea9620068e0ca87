"""High-level user API: train / caption / evaluate.

The one-stop surface for users coming from the reference: build or load
a model, caption images, score captions — without touching the lower
layers. (The reference exposes this only through its CLI pipeline,
image_captioner.py:93-151.)
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from . import START_ID
from .config import DecodeConfig, NetConfig
from .data.coco import CocoData, decode_captions
from .decode import (
    beam_search,
    fused_greedy_decode,
    greedy_decode,
)


class Captioner:
    """Caption images with a trained policy (+ optional value) network.

    >>> cap = Captioner(a2c_params, cfg, data.idx_to_word)
    >>> cap.caption(features)                 # greedy, O(T)
    >>> cap.caption(features, beam_size=5)    # value-guided beam search

    The fused Pallas kernels are the default serving path via *verified
    dispatch* (``use_fused_kernel=None``): the first call runs both the
    fused kernel and the XLA path and compares tokens — if they agree
    exactly (trained COCO-shape weights: 0/127 divergence measured on
    v5e; see benchmarks/BENCHMARKS.md) the kernel serves every later
    call, otherwise (near-tie-dominated weights, no TPU, bidirectional)
    the XLA path does. Pass ``True``/``False`` to force either side.
    """

    def __init__(self, params: dict, cfg: NetConfig, idx_to_word: dict,
                 mesh=None):
        """``mesh``: a :class:`jax.sharding.Mesh` with a ``data`` axis
        serves each request batch-sharded across its chips/hosts
        (:mod:`.parallel.serve`); single-chip fused kernels step aside —
        mesh takes precedence, mirroring ``test_a2c_network``. Faithful
        beams stay single-device (Q2 couples the batch)."""
        if "policy" in params:  # a2c pytree
            self._policy = params["policy"]
            self._value = params.get("value")
        else:
            self._policy = params
            self._value = None
        self._cfg = cfg
        self._idx_to_word = idx_to_word
        self._mesh = mesh
        self._mesh_params = None  # params committed to the mesh, once
        self._jitted = {}
        self._fused_verdict = {}  # decode key -> VerifiedDispatch

    def caption_tokens(
        self,
        features: jax.Array,
        beam_size: int = 0,
        use_fused_kernel=None,
        faithful_beam: bool = False,
    ) -> np.ndarray:
        """Token ids ``[N, T]`` for a feature batch."""
        cfg = self._cfg
        features = jnp.asarray(features, jnp.float32)
        start = jnp.full((features.shape[0],), START_ID, jnp.int32)
        # params flow as jit ARGUMENTS (closures would embed them as
        # program constants, bloating every compile payload)
        if beam_size > 0:
            if self._value is None:
                raise ValueError("beam search needs a value network (pass a2c params)")
            fusable = not cfg.bidirectional and not faithful_beam
            if use_fused_kernel and not fusable:
                raise ValueError(
                    "use_fused_kernel=True cannot be honored: the fused beam "
                    "kernel is unidirectional and non-faithful only"
                )
            dcfg = DecodeConfig(
                beam_size=beam_size, max_seq_len=cfg.max_seq_len,
                per_sample_beams=not faithful_beam,
            )
            if faithful_beam:
                # checkpoint-faithful mode: Q2 batch-mean ranking WITH the
                # reference's Q1-stateful value encoding threaded through
                # eval — the same path the CLI's --faithful_beam uses
                from .decode.beam_compat import beam_search_compat

                beam_fn = beam_search_compat
            else:
                # carried-state beam serves both direction modes (the
                # bidi step is one extra backward cell — models/policy.py)
                beam_fn = beam_search
            # [:2]: beam_search_compat also returns its Q1 carry (reset
            # per call here — the reference resets per slice)
            xla_fn = self._get(("beam", beam_size, faithful_beam), lambda: jax.jit(
                lambda pp, vp, f, s: beam_fn(pp, vp, cfg, dcfg, f, s)[:2]
            ))

            if self._mesh is not None and not faithful_beam:
                if use_fused_kernel:
                    raise ValueError(
                        "use_fused_kernel=True cannot be honored on a mesh: "
                        "the fused beam kernel is single-chip — drop the "
                        "mesh or the force flag"
                    )
                from .parallel.serve import sharded_beam_tokens

                pp, vp = self._mesh_committed()
                toks, _ = sharded_beam_tokens(
                    self._mesh, pp, vp, cfg, dcfg, features, start,
                )
                return np.asarray(toks[:, 0])

            def fused(f, s):
                from .ops.pallas_beam import fused_beam_search

                toks, _ = fused_beam_search(
                    self._policy, self._value, f, s,
                    max_len=cfg.max_seq_len, beam=beam_size, block_n=0,
                    value_weight=dcfg.value_weight,
                    logprob_weight=dcfg.logprob_weight,
                )
                return np.asarray(toks[:, 0])

            if fusable and use_fused_kernel:
                return fused(features, start)
            if fusable and use_fused_kernel is None:
                return self._dispatch_verified(
                    ("beam", beam_size), fused,
                    lambda f, s: np.asarray(xla_fn(self._policy, self._value, f, s)[0][:, 0]),
                    features, start,
                )
            toks, _ = xla_fn(self._policy, self._value, features, start)
            return np.asarray(toks[:, 0])

        if self._mesh is not None:
            if use_fused_kernel:
                raise ValueError(
                    "use_fused_kernel=True cannot be honored on a mesh: the "
                    "fused greedy kernel is single-chip — drop the mesh or "
                    "the force flag"
                )
            from .parallel.serve import sharded_greedy_tokens

            pp, _ = self._mesh_committed()
            return np.asarray(
                sharded_greedy_tokens(self._mesh, pp, cfg, features, start)
            )

        xla_fn = self._get("greedy", lambda: jax.jit(
            lambda pp, f, s: greedy_decode(pp, cfg, f, s)
        ))

        def fused(f, s):
            return np.asarray(
                fused_greedy_decode(self._policy, f, s, max_len=cfg.max_seq_len)
            )

        if use_fused_kernel and cfg.bidirectional:
            raise ValueError(
                "use_fused_kernel=True cannot be honored: the fused greedy "
                "kernel is unidirectional only"
            )
        if use_fused_kernel and not cfg.bidirectional:
            return fused(features, start)
        if use_fused_kernel is None and not cfg.bidirectional:
            return self._dispatch_verified(
                ("greedy",), fused,
                lambda f, s: np.asarray(xla_fn(self._policy, f, s)),
                features, start,
            )
        return np.asarray(xla_fn(self._policy, features, start))

    def _mesh_committed(self):
        """Parameters committed to the mesh's replicated layout ONCE —
        re-uploading the ~40 MB pytrees per request would dominate the
        sharded serving hot path (serve.py's replicate() then passes the
        committed tree through untouched)."""
        if self._mesh_params is None:
            from .parallel.sharding import replicate

            self._mesh_params = (
                replicate(self._mesh, self._policy),
                (replicate(self._mesh, self._value)
                 if self._value is not None else None),
            )
        return self._mesh_params

    def _dispatch_verified(self, key, fused_fn, xla_fn, *args,
                           retry_args=None):
        """Auto dispatch through the shared :class:`VerifiedDispatch`
        (utils/dispatch.py): first call compares fused vs XLA tokens on
        the live batch; exact agreement locks in the kernel, anything
        else (mismatch, or no Mosaic backend) locks in XLA. Stochastic
        paths pass ``retry_args`` so a per-key canary coin flip (a top-2
        gap inside cross-compiler matmul noise) re-canaries under fresh
        keys instead of latching XLA for the server's lifetime."""
        from .utils.dispatch import VerifiedDispatch

        disp = self._fused_verdict.get(key)
        if disp is None:
            def log(ok, exc, key=key):
                if not ok:
                    import sys

                    why = (f"{type(exc).__name__}: {exc}" if exc is not None
                           else "canary tokens diverged")
                    print(f"[Captioner] fused kernel disabled for {key} "
                          f"({why}); serving via XLA", file=sys.stderr)

            disp = VerifiedDispatch(fused_fn, xla_fn, equal=np.array_equal,
                                    on_verdict=log, retry_args=retry_args)
            self._fused_verdict[key] = disp
        return disp(*args)

    def sample_tokens(
        self,
        features,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        num_samples: int = 1,
        seed: int = 0,
        use_fused_kernel=None,
    ) -> np.ndarray:
        """Stochastic decode: token ids ``[N, T]`` (or ``[N, R, T]``
        when ``num_samples=R > 1``) drawn from the filtered softmax
        (:mod:`.decode.sample`). ``temperature=0`` is exact greedy.
        Equal ``seed`` gives bit-identical captions; n-best lists run
        as ONE batched scan. A mesh-holding Captioner serves each
        request batch-sharded over the data axis
        (:func:`.parallel.serve.sharded_sample_tokens`) — token-exact
        vs single-device at equal seeds, the same contract as greedy
        (bidirectional policies shard too, riding the same carried
        scan — models/policy.py). Single-device unidirectional
        FILTERED requests (top-k or nucleus on) default to the fused
        Pallas kernel behind *verified dispatch*
        (:mod:`.ops.pallas_sample`), same contract as greedy: the first
        call for each (top_k, nucleus, num_samples) variant compares
        fused vs XLA tokens on the live batch (re-canarying under fresh
        keys on a coin-flip mismatch) and the winner serves every later
        call. Unfiltered sampling runs the XLA scan (measured faster
        there); the only fused-path size bound is the int32 threefry
        counter space (``fused_rows_ok``: padded rows x vocab < 2**31,
        ~2M rows at COCO vocab) — see the dispatch-policy comment below
        and BENCHMARKS.md round 5.
        """
        cfg = self._cfg
        if num_samples < 1:
            raise ValueError(f"num_samples must be >= 1, got {num_samples}")
        if temperature < 0:
            raise ValueError(f"temperature must be >= 0, got {temperature}")
        if not (0.0 < top_p <= 1.0):
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        features = jnp.asarray(features, jnp.float32)
        start = jnp.full((features.shape[0],), START_ID, jnp.int32)
        if temperature == 0:
            toks = self.caption_tokens(features,
                                       use_fused_kernel=use_fused_kernel)
            if num_samples > 1:  # greedy drafts are all identical
                toks = np.repeat(toks[:, None, :], num_samples, axis=1)
            return toks
        if self._mesh is not None:
            if use_fused_kernel:
                raise ValueError(
                    "use_fused_kernel=True cannot be honored on a mesh: the "
                    "fused sampling kernel is single-chip — drop the mesh "
                    "or the force flag"
                )
            from .parallel.serve import sharded_sample_tokens

            pp, _ = self._mesh_committed()
            toks = sharded_sample_tokens(
                self._mesh, pp, cfg, features, start,
                jax.random.PRNGKey(seed), num_samples=num_samples,
                temperature=float(temperature), top_k=top_k,
                top_p=float(top_p) if top_p < 1.0 else None,
            )
            return np.asarray(toks)
        from .decode.sample import sample_decode_n
        from .ops.pallas_sample import fused_rows_ok

        n = features.shape[0]
        use_top_p = top_p < 1.0  # 1.0 keeps all: skip the per-step sort
        fn = self._get(("sample", top_k, use_top_p, num_samples), lambda: jax.jit(
            lambda pp, f, s, key, temp, tp: sample_decode_n(
                pp, cfg, f, s, key, num_samples,
                temperature=temp, top_k=top_k,
                top_p=tp if use_top_p else None,
            )
        ))

        def xla_run(f, s, key, temp, tp):
            return np.asarray(fn(self._policy, f, s, key, temp, tp))

        fusable = (not cfg.bidirectional
                   and fused_rows_ok(n * num_samples, cfg.vocab_size))
        if use_fused_kernel and not fusable:
            raise ValueError(
                "use_fused_kernel=True cannot be honored: the fused sampling "
                "kernel is unidirectional only and caps the row count at the "
                "int32 threefry counter space (rows x vocab < 2**31; "
                f"requested {n}x{num_samples} rows x {cfg.vocab_size} vocab)"
            )
        # measured dispatch policy (BENCHMARKS.md round 5): the fused
        # kernel beats XLA when a filter is on (1.56-5.02x — it replaces
        # the per-step lax.top_k/sort with 32-step bisection, and with
        # round 5's in-kernel threefry noise the old 8192-row cap is
        # gone, so big filtered batches no longer cliff onto the sort);
        # PLAIN sampling is still a measured fused loss (0.18-0.97x —
        # XLA's unfiltered step is already matmul-bound), so unfiltered
        # requests stay on the XLA scan by default.
        filtered = (0 < top_k < cfg.vocab_size) or use_top_p

        def fused_run(f, s, key, temp, tp):
            from .ops.pallas_sample import fused_sample_decode

            # samples-minor tiling, exactly like sample_decode_n — the
            # Gumbel stream over the tiled batch then matches key-for-key
            ff = jnp.repeat(f, num_samples, axis=0)
            ss = jnp.repeat(s, num_samples, axis=0)
            toks = fused_sample_decode(
                self._policy, ff, ss, key, max_len=cfg.max_seq_len,
                temperature=temp, top_k=top_k,
                top_p=tp if use_top_p else None,
            )
            # shape from THIS call's batch, never the enclosing scope:
            # VerifiedDispatch caches this closure per (k, p, R) variant
            # and replays it for every later batch size
            return np.asarray(toks).reshape(f.shape[0], num_samples, -1)

        def rekey(attempt, f, s, key, temp, tp):
            # fresh-canary retry: same batch, fold_in-derived key — a
            # coin-flip divergence (tie inside matmul noise) re-rolls,
            # a systematic kernel break fails under every key
            return (f, s, jax.random.fold_in(key, attempt), temp, tp)

        args = (features, start, jax.random.PRNGKey(seed),
                float(temperature), float(top_p))
        if fusable and use_fused_kernel:
            toks = fused_run(*args)
        elif fusable and filtered and use_fused_kernel is None:
            toks = self._dispatch_verified(
                ("sample", top_k, use_top_p, num_samples),
                fused_run, xla_run, *args, retry_args=rekey)
        else:
            toks = xla_run(*args)
        return toks[:, 0] if num_samples == 1 else toks

    def sample_captions(self, features, num_samples: int = 1, **kw) -> List:
        """Sampled caption strings: a flat list for ``num_samples=1``,
        else one R-caption list per image."""
        toks = self.sample_tokens(features, num_samples=num_samples, **kw)
        if num_samples == 1:
            return decode_captions(toks, self._idx_to_word)
        return [decode_captions(row, self._idx_to_word) for row in toks]

    def caption(self, features, **kw) -> List[str]:
        """Caption strings for a feature batch."""
        return decode_captions(self.caption_tokens(features, **kw), self._idx_to_word)

    def caption_images(self, images, extractor: "FeatureExtractor",
                       batch_size: int = 64, **kw) -> List[str]:
        """Caption raw images end-to-end: pixels -> VGG16 fc7
        (-> PCA) -> decode. ``images`` is a list of file paths or an
        ``[N, H, W, 3]`` uint8 array; ``extractor`` bundles the visual
        front end (:func:`load_feature_extractor`). The reference
        never closes this loop (it consumes pre-extracted h5 features,
        utilities.py:61-73); here it is one call."""
        return self.caption(
            self._extract_checked(images, extractor, batch_size), **kw)

    def sample_images(self, images, extractor: "FeatureExtractor",
                      batch_size: int = 64, **kw) -> List:
        """Stochastic :meth:`sample_captions` from raw images (the
        sampling twin of :meth:`caption_images`)."""
        return self.sample_captions(
            self._extract_checked(images, extractor, batch_size), **kw)

    def _extract_checked(self, images, extractor, batch_size):
        feats = extractor(images, batch_size=batch_size)
        if feats.shape[1] != self._cfg.input_dim:
            raise ValueError(
                f"extractor produces {feats.shape[1]}-d features but the "
                f"model was trained on {self._cfg.input_dim}-d input — "
                "pass the matching PCA projection (or none, for raw fc7 "
                "models) to load_feature_extractor"
            )
        return feats

    def _get(self, key, make):
        if key not in self._jitted:
            self._jitted[key] = make()
        return self._jitted[key]


class FeatureExtractor:
    """The visual front end: VGG16 fc7 features, optionally PCA-reduced
    to the bundle's compact dimension (reference consumes the
    pre-extracted ``*_vgg16_fc7_pca.h5`` tables, utilities.py:61-73;
    this is the live equivalent).

    ``images``: file paths (decoded on host with the canonical
    resize-256/center-crop-224 geometry) or an ``[N, H, W, 3]`` array.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs the VGG stack with
    weights and activations in that dtype — half the HBM traffic for
    the bandwidth-bound conv/fc layers. The MXU already multiplies in
    bf16 at XLA default precision, so this changes memory traffic, not
    multiply precision; fc7 outputs drift at bf16 rounding level
    (opt-in — features feed a PCA basis fitted in f32). Params are
    cast ONCE here, not per call.

    ``mesh`` shards each extraction batch over the mesh's ``data`` axis
    (single-controller multi-chip; VGG16 is embarrassingly
    batch-parallel). Batch sizes must then be multiples of the data
    axis.
    """

    def __init__(self, vgg_params: dict, projection=None, compute_dtype=None,
                 mesh=None):
        from .models import vgg

        if compute_dtype is not None:
            vgg_params = vgg.cast_params(vgg_params, compute_dtype)
        if mesh is not None:
            # commit the ~0.5 GB tree to the replicated layout ONCE;
            # extract_features' per-call replicate() then passes the
            # already-committed tree through (a serving extractor would
            # otherwise re-broadcast the weights every request)
            from .parallel.sharding import replicate

            vgg_params = replicate(mesh, vgg_params)
        self.vgg_params = vgg_params
        self.projection = projection
        self.compute_dtype = compute_dtype
        self.mesh = mesh

    @property
    def dim(self) -> int:
        """Output feature dimension (PCA components, or raw fc7)."""
        if self.projection is not None:
            return int(self.projection.components.shape[1])
        return 4096

    def __call__(self, images, batch_size: int = 64, progress=None) -> np.ndarray:
        from .models import vgg

        loader = None
        if len(images) and isinstance(images[0], str):
            from .cli.extract import load_image_batch

            loader = load_image_batch
        feats = vgg.extract_features(
            self.vgg_params, images, batch_size=batch_size,
            projection=self.projection, loader=loader, progress=progress,
            compute_dtype=self.compute_dtype, mesh=self.mesh,
        )
        return np.asarray(feats, np.float32)


def load_feature_extractor(weights: str = "", pca: str = "",
                           bf16: bool = False, mesh=None) -> FeatureExtractor:
    """Build a :class:`FeatureExtractor` from files: VGG16 weights (a
    torchvision-layout ``.pt`` state dict or a native ``.ckpt``; empty
    -> random weights, pipeline testing only) and an optional fitted
    PCA projection ``.npz`` (cli/extract.py writes one). ``bf16`` runs
    the stack in bfloat16 (see :class:`FeatureExtractor`)."""
    from .models import vgg

    if weights.endswith(".pt"):
        from .models import vgg_from_torch
        from .models.convert import load_torch_state_dict

        params = vgg_from_torch(load_torch_state_dict(weights))
    elif weights:
        from .train.checkpoint import load_pytree

        params = load_pytree(vgg.init(jax.random.PRNGKey(0)), weights)
    else:
        import sys

        print("[FeatureExtractor] WARNING: random VGG16 weights "
              "(pipeline testing only)", file=sys.stderr)
        params = vgg.init(jax.random.PRNGKey(0))
    projection = None
    if pca:
        from .data.pca import PCAProjection

        projection = PCAProjection.load(pca)
    return FeatureExtractor(
        params, projection,
        compute_dtype=jnp.bfloat16 if bf16 else None, mesh=mesh)


def evaluate_captions(real: List[str], generated: List[str]) -> dict:
    """Score caption pairs (BLEU 1-4, METEOR, ROUGE-L, CIDEr)."""
    from .metrics import score

    refs = {i: [r.strip()] for i, r in enumerate(real)}
    hypos = {i: [g.strip()] for i, g in enumerate(generated)}
    return score(refs, hypos)


def load_captioner(
    model_path: str,
    data: CocoData,
    network_paths: dict,
    bidirectional: bool = False,
    mesh=None,
) -> Captioner:
    """Build a :class:`Captioner` from checkpoints on disk (native or .pt)."""
    from .train.loops import load_a2c_models

    params, cfg = load_a2c_models(model_path, data, network_paths, bidirectional,
                                  mesh=mesh)
    return Captioner(params, cfg, data.idx_to_word, mesh=mesh)

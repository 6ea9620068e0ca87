"""Captioning HTTP server with dynamic micro-batching.

The reference exposes inference only as a CLI pass that dumps caption
files (reference trainers.py:619-665; image_captioner.py:119-151) —
there is no serving story. This module is the production-serving layer
of the framework: a stdlib-only HTTP front end over
:class:`.api.Captioner` whose batcher coalesces concurrent requests
into single device dispatches — the TPU wants large batches
(bench: decode throughput saturates in the thousands of captions per
dispatch), while clients send a few images at a time.

Design:
  * one background batcher thread owns ALL device work (single-stream
    dispatch; JAX programs are thread-compatible but serializing them
    avoids interleaved-dispatch latency jitter);
  * requests enqueue ``(features, beam_size, future)``; the batcher
    drains the queue, groups by decode config, concatenates up to
    ``max_batch`` rows, decodes once, and scatters the rows back;
  * requests wait at most ``max_wait_ms`` for co-batching — the classic
    latency/throughput knob;
  * endpoints: ``POST /caption`` (JSON ``{"features": [[...]],
    "beam_size": 0}`` or ``{"images_b64": [...]}``; dense rows can ride
    ``application/octet-stream`` — raw little-endian f32 rows, beam
    size in ``X-Beam-Size`` — which skips the ~40 ms/64-row JSON float
    encode+parse tax) -> ``{"captions": [...]}``, ``GET /healthz``,
    ``GET /stats``. Stochastic decode rides the same endpoint: JSON
    ``"sample": {"temperature": 0.8, "top_k": 0, "top_p": 0.9,
    "num_samples": 1, "seed": 0}`` (or ``X-Temperature``/``X-Top-K``/
    ``X-Top-P``/``X-Num-Samples``/``X-Sample-Seed`` headers on the
    binary path); ``num_samples > 1`` returns one R-caption list per
    row. Wire formats wrapped by :mod:`.client`; runbook in
    ``docs/SERVING.md``; measured numbers in BENCHMARKS.md
    "Serving tier".

Multi-chip serving composes by constructing the
:class:`.api.Captioner` with a mesh; the server itself is
placement-agnostic.

Measured on a real v5e (random weights, COCO shapes, greedy): after
``warmup``, a 4-image request answers in ~80 ms end-to-end HTTP, and a
16-client burst of 256 images co-batches into 3 device dispatches.
Without bucketing+warmup the FIRST request at each new co-batch size
paid a multi-minute remote compile on this backend — which is why both
exist.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from .api import Captioner


_SAMPLE_KEYS = ("temperature", "top_k", "top_p", "num_samples", "seed")


def _parse_sample(src: dict, max_samples: int) -> tuple:
    """Validate a sampling-config mapping (JSON object or header
    strings) into the canonical ``(temperature, top_k, top_p,
    num_samples, seed)`` tuple the batcher groups on.

    ``max_samples`` bounds ``num_samples``: the dispatched device batch
    is ``bucket * R`` rows, so an unbounded R would bypass the
    max_batch/max_body caps, stall the single batcher thread on a huge
    scan, and compile a fresh program per distinct R."""
    import math

    unknown = set(src) - set(_SAMPLE_KEYS)
    if unknown:
        raise ValueError(f"unknown sample keys: {sorted(unknown)} "
                         f"(allowed: {list(_SAMPLE_KEYS)})")
    t = float(src.get("temperature", 1.0))
    k = int(src.get("top_k", 0))
    p = float(src.get("top_p", 1.0))
    r = int(src.get("num_samples", 1))
    seed = int(src.get("seed", 0))
    # isfinite, not just range checks: JSON's NaN passes `t < 0` and
    # would 200-OK garbage captions; temperature=inf silently samples
    # uniformly
    if not math.isfinite(t) or t < 0:
        raise ValueError(f"temperature must be finite and >= 0, got {t}")
    if not math.isfinite(p) or not (0.0 < p <= 1.0):
        raise ValueError(f"top_p must be in (0, 1], got {p}")
    if r < 1:
        raise ValueError(f"num_samples must be >= 1, got {r}")
    if r > max_samples:
        raise ValueError(
            f"num_samples {r} exceeds the server limit of {max_samples} "
            "(--max_samples)")
    return (t, k, p, r, seed)


class _Pending:
    __slots__ = ("features", "pixels", "beam_size", "sample", "event",
                 "result", "error", "t_enq")

    def __init__(self, features: Optional[np.ndarray], beam_size: int,
                 pixels: Optional[np.ndarray] = None,
                 sample: Optional[tuple] = None):
        self.features = features
        self.pixels = pixels  # raw [N, 224, 224, 3] awaiting extraction
        self.beam_size = beam_size
        self.sample = sample  # (temp, top_k, top_p, num_samples, seed)
        self.event = threading.Event()
        self.result: Optional[List[str]] = None
        self.error: Optional[str] = None
        self.t_enq = time.perf_counter()

    @property
    def rows(self) -> int:
        return (self.features if self.pixels is None else self.pixels).shape[0]


class CaptionServer:
    """Dynamic-batching caption service.

    >>> srv = CaptionServer(captioner, port=0)  # port 0: pick a free one
    >>> srv.start()
    >>> srv.port
    >>> ... POST http://host:port/caption ...
    >>> srv.stop()
    """

    def __init__(self, captioner: Captioner, host: str = "127.0.0.1",
                 port: int = 8000, max_batch: int = 1024,
                 max_wait_ms: float = 5.0, min_bucket: int = 8,
                 extractor=None, extract_batch: int = 64,
                 max_body_mb: float = 256.0, max_samples: int = 64):
        """``extractor``: an optional :class:`.api.FeatureExtractor`
        enabling the raw-image endpoint (``POST /caption`` with
        ``images_b64``: base64-encoded JPEG/PNG files). Image pixels are
        decoded on the handler thread (host CPU); the VGG16 forward runs
        on the batcher thread like all device work. The first image
        request pays the VGG compile (minutes on a remote-compile
        backend — the persistent compile cache makes reruns cheap)."""
        if extractor is not None:
            if extractor.dim != captioner._cfg.input_dim:
                raise ValueError(
                    f"extractor produces {extractor.dim}-d features but the "
                    f"model expects {captioner._cfg.input_dim}-d input — pass "
                    "the matching PCA projection (or none for raw-fc7 models)"
                )
            try:  # fail at INIT, not as a per-request 400 blaming the client
                import PIL  # noqa: F401
            except ImportError as e:
                raise ValueError(
                    "the raw-image endpoint needs Pillow to decode uploads"
                ) from e
        if extract_batch < 1:
            raise ValueError("extract_batch must be >= 1")
        if max_body_mb <= 0:
            raise ValueError("max_body_mb must be positive")
        if max_samples < 1:
            raise ValueError("max_samples must be >= 1")
        self._max_samples = max_samples
        self._extractor = extractor
        self._cap = captioner
        self._max_body = int(max_body_mb * 2**20)
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._max_batch = max_batch
        self._max_wait = max_wait_ms / 1e3
        # XLA compiles one program per input SHAPE: dispatching raw
        # co-batch sizes would compile per distinct size (minutes each on
        # a remote-compile backend). Batches pad up to power-of-two
        # buckets so at most log2(max_batch) programs exist per decode
        # config; padding rows repeat the last row and are sliced off.
        self._buckets = []
        b = max(1, min_bucket)
        while b < max_batch:
            self._buckets.append(b)
            b *= 2
        self._buckets.append(max_batch)
        # extraction buckets: the VGG forward pads to a bucket too (one
        # compiled conv program per size), capped at extract_batch so a
        # single-image request doesn't pay a full 64-image forward
        self._extract_buckets = ([x for x in self._buckets if x < extract_batch]
                                 + [extract_batch])
        self._stop = threading.Event()
        self._carry: Optional[_Pending] = None
        self._stats_lock = threading.Lock()
        import collections

        self.stats = {
            "requests": 0, "captions": 0, "batches": 0, "errors": 0,
            "images_extracted": 0, "max_batch_rows": 0,
            # bounded: a long-running server must not grow per-request
            "latency_ms": collections.deque(maxlen=10_000),
        }
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet access log
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    import jax

                    self._reply(200, {
                        "ok": True,
                        "platform": jax.devices()[0].platform,
                        "devices": jax.device_count(),
                    })
                elif self.path == "/stats":
                    self._reply(200, server.snapshot_stats())
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/caption":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                except (TypeError, ValueError):
                    self._reply(400, {"error": "bad Content-Length header"})
                    return
                if n < 0:
                    # a negative length must not reach rfile.read(n):
                    # BufferedReader treats negative as read-to-EOF —
                    # exactly the unbounded buffering the cap prevents
                    self._reply(400, {"error": "bad Content-Length header"})
                    return
                if n > server._max_body:
                    # refuse BEFORE reading: a multi-GB body would be
                    # buffered wholesale on this handler thread
                    self._reply(413, {
                        "error": f"request body {n} B exceeds the "
                                 f"{server._max_body} B limit "
                                 "(max_body_mb)"})
                    # drain (without storing) a bounded amount of the
                    # already-in-flight body so the close doesn't RST
                    # the connection before the client reads the 413
                    left = min(n, 32 * 2**20)
                    while left > 0:
                        chunk = self.rfile.read(min(65536, left))
                        if not chunk:
                            break
                        left -= len(chunk)
                    return
                ctype = (self.headers.get("Content-Type") or "")
                ctype = ctype.split(";")[0].strip().lower()
                if ctype == "application/octet-stream":
                    # binary dense-feature path: JSON costs ~47 ms/64
                    # rows just encoding+parsing 32k floats on a small
                    # host core (benchmarks/bench_server.py); raw
                    # little-endian f32 rows skip all of it. Shape is
                    # implied: [N, input_dim], N from the byte count.
                    raw = self.rfile.read(n)  # read BEFORE any 400: an
                    # unread in-flight body + connection close can RST
                    # away the reply (same reason the 413 path drains)
                    try:
                        beam = int(self.headers.get("X-Beam-Size", 0))
                        hdr = {"temperature": "X-Temperature",
                               "top_k": "X-Top-K", "top_p": "X-Top-P",
                               "num_samples": "X-Num-Samples",
                               "seed": "X-Sample-Seed"}
                        src = {k: self.headers[h] for k, h in hdr.items()
                               if h in self.headers}
                        sample = (_parse_sample(src, server._max_samples)
                                  if src else None)
                        if sample is not None and beam:
                            raise ValueError(
                                "beam search and sampling are mutually "
                                "exclusive (drop X-Beam-Size or the "
                                "X-Temperature/... headers)")
                        want = server._cap._cfg.input_dim
                        if not raw or len(raw) % (4 * want):
                            raise ValueError(
                                f"binary body must be [N, {want}] "
                                f"little-endian float32 rows ({len(raw)} B "
                                f"is not a positive multiple of {4 * want})")
                        feats = np.frombuffer(raw, "<f4").reshape(-1, want)
                        pixels = None
                    except Exception as e:
                        self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                        return
                    self._dispatch_and_reply(feats, beam, pixels, sample)
                    return
                try:
                    req = json.loads(self.rfile.read(n))
                    beam = int(req.get("beam_size", 0))
                    sample = None
                    if "sample" in req:
                        if not isinstance(req["sample"], dict):
                            raise ValueError(
                                "'sample' must be an object, e.g. "
                                '{"temperature": 0.8, "top_p": 0.9}')
                        sample = _parse_sample(req["sample"],
                                               server._max_samples)
                        if beam:
                            raise ValueError(
                                "beam_size and 'sample' are mutually "
                                "exclusive")
                    feats = pixels = None
                    if "images_b64" in req:
                        if "features" in req:
                            raise ValueError(
                                "send either 'features' or 'images_b64', not both")
                        if server._extractor is None:
                            raise ValueError(
                                "server has no feature extractor — start it "
                                "with VGG weights (--vgg_weights) to caption "
                                "raw images")
                        import base64
                        import io

                        from .cli.extract import load_image_batch

                        blobs = req["images_b64"]
                        if not isinstance(blobs, list) or not blobs:
                            raise ValueError("images_b64 must be a non-empty list")
                        if len(blobs) > server._max_batch:
                            # the body-size cap does not bound DECODED
                            # pixels (~150 KB per image, ~750x a small
                            # base64 JPEG) — cap the count too
                            raise ValueError(
                                f"{len(blobs)} images exceed the "
                                f"per-request limit of {server._max_batch}")
                        # decode on THIS handler thread (pure host CPU);
                        # the VGG forward stays on the batcher thread
                        pixels = load_image_batch(
                            [io.BytesIO(base64.b64decode(s)) for s in blobs])
                    else:
                        feats = np.asarray(req["features"], np.float32)
                        if feats.ndim == 1:
                            feats = feats[None, :]
                        if feats.ndim != 2:
                            raise ValueError("features must be [N, F] or [F]")
                        want = server._cap._cfg.input_dim
                        if feats.shape[1] != want:
                            raise ValueError(
                                f"feature dim {feats.shape[1]} != model's {want}")
                except Exception as e:  # malformed request
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                self._dispatch_and_reply(feats, beam, pixels, sample)

            def _dispatch_and_reply(self, feats, beam, pixels, sample=None):
                if server._stop.is_set():
                    self._reply(503, {"error": "server stopping"})
                    return
                pending = _Pending(feats, beam, pixels=pixels, sample=sample)
                server._queue.put(pending)
                server._await(pending)
                if pending.error == "server stopped":
                    # rescued stop/enqueue race: same condition as the
                    # pre-enqueue _stop gate, so same retryable answer
                    # (and no error-stat skew between the two paths)
                    self._reply(503, {"error": pending.error})
                elif pending.error is not None:
                    with server._stats_lock:
                        server.stats["requests"] += 1
                        server.stats["errors"] += 1
                    self._reply(500, {"error": pending.error})
                else:
                    with server._stats_lock:
                        server.stats["requests"] += 1
                        server.stats["captions"] += len(pending.result)
                        server.stats["latency_ms"].append(
                            (time.perf_counter() - pending.t_enq) * 1e3)
                    self._reply(200, {"captions": pending.result})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._threads: List[threading.Thread] = []

    # ------------------------------------------------------------------
    def snapshot_stats(self) -> dict:
        with self._stats_lock:
            lat = sorted(self.stats["latency_ms"])
            snap = {k: v for k, v in self.stats.items() if k != "latency_ms"}
        if lat:
            snap["latency_p50_ms"] = round(lat[len(lat) // 2], 3)
            snap["latency_p95_ms"] = round(lat[int(len(lat) * 0.95)], 3)
        return snap

    def _drain(self) -> List[_Pending]:
        """Block for one request, then co-batch whatever else arrives
        within ``max_wait`` — never exceeding ``max_batch`` rows (a
        request that would overflow carries to the next batch, so every
        multi-request dispatch stays inside the compiled buckets)."""
        if self._carry is not None:
            first, self._carry = self._carry, None
        else:
            try:
                first = self._queue.get(timeout=0.2)
            except queue.Empty:
                return []
        group = [first]
        rows = first.rows
        deadline = time.perf_counter() + self._max_wait
        while rows < self._max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if rows + nxt.rows > self._max_batch:
                self._carry = nxt
                break
            group.append(nxt)
            rows += nxt.rows
        return group

    def _batcher(self):
        while not self._stop.is_set():
            group = self._drain()
            if not group:
                continue
            # raw-image pendings: ONE co-batched VGG extraction for the
            # whole group (device work stays on this thread), then they
            # join the feature pendings below
            pix = [p for p in group if p.features is None]
            if pix:
                try:
                    all_px = np.concatenate([p.pixels for p in pix], axis=0)
                    eb = next((x for x in self._extract_buckets
                               if x >= all_px.shape[0]),
                              self._extract_buckets[-1])
                    feats = self._extractor(all_px, batch_size=eb)
                    off = 0
                    for p in pix:
                        k = p.pixels.shape[0]
                        p.features = np.asarray(feats[off:off + k], np.float32)
                        off += k
                    with self._stats_lock:
                        self.stats["images_extracted"] += int(all_px.shape[0])
                except Exception as e:
                    for p in pix:
                        p.error = f"{type(e).__name__}: {e}"
                        p.event.set()
                    group = [p for p in group if p.features is not None]
                    if not group:
                        continue
            # group by decode config (beam size / sampling params): each
            # config is its own compiled program, so mixed groups split
            # into sub-batches. Sampled requests co-batch only with
            # identical (temperature, top_k, top_p, num_samples, seed);
            # note a row's draw depends on its position in the co-batch
            # (the Gumbel stream is keyed per step across the whole
            # batch), so under concurrent load equal-seed requests
            # reproduce only per-dispatch, not per-row.
            by_cfg = {}
            for p in group:
                by_cfg.setdefault((p.beam_size, p.sample), []).append(p)
            for (beam, sample), members in by_cfg.items():
                try:
                    feats = np.concatenate([m.features for m in members], axis=0)
                    n = feats.shape[0]
                    captions: List[str] = []
                    # oversized single requests split into max_batch
                    # chunks; every dispatched shape is a bucket
                    for lo in range(0, n, self._max_batch):
                        chunk = feats[lo : lo + self._max_batch]
                        c = chunk.shape[0]
                        bucket = next(b for b in self._buckets if b >= c)
                        if bucket > c:
                            chunk = np.concatenate(
                                [chunk, np.repeat(chunk[-1:], bucket - c, axis=0)],
                                axis=0)
                        if sample is None:
                            captions += self._cap.caption(
                                chunk, beam_size=beam)[:c]
                        else:
                            t, k, tp, r, seed = sample
                            # per-chunk seed = seed + row offset: chunks
                            # of one oversized request must not reuse the
                            # seed (identical rows in different chunks
                            # would draw identical noise); documented in
                            # SERVING.md's reproducibility rule
                            captions += self._cap.sample_captions(
                                chunk, temperature=t, top_k=k, top_p=tp,
                                num_samples=r, seed=seed + lo)[:c]
                except Exception as e:
                    for m in members:
                        m.error = f"{type(e).__name__}: {e}"
                        m.event.set()
                    continue
                with self._stats_lock:
                    self.stats["batches"] += 1
                    self.stats["max_batch_rows"] = max(
                        self.stats["max_batch_rows"], min(n, self._max_batch))
                off = 0
                for m in members:
                    k = m.features.shape[0]
                    m.result = captions[off : off + k]
                    off += k
                    m.event.set()

    # ------------------------------------------------------------------
    def warmup(self, feature_dim: int, beam_sizes=(0,), buckets=None,
               image_buckets=None, sample_configs=()):
        """Pre-compile the decode programs for the given bucket sizes so
        the first real requests don't pay compile latency (remote
        compiles on tunneled backends run minutes). Call before or after
        :meth:`start`. When the server has a feature extractor,
        ``image_buckets`` (default: every extraction bucket) also warms
        the VGG forward at each extraction shape — an unwarmed VGG would
        stall the single batcher thread for the conv compile (~minutes
        remote) the first time an image request arrives mid-traffic;
        pass ``[]`` to skip.

        ``sample_configs``: sampling-request mappings (the wire format's
        ``"sample"`` objects, e.g. ``{"top_k": 40, "num_samples": 3}``)
        to pre-compile per bucket — a sampled-traffic server without
        this pays the sample-scan compile on the batcher thread at the
        first live request, exactly the stall warmup exists to prevent
        for greedy/beam. The compiled program keys on
        ``(top_k, top_p < 1, num_samples)``, so one config warms every
        temperature/seed and every same-shape top_p."""
        rng = np.random.default_rng(0)  # NOT zeros: the verified-dispatch
        # canary compares fused-vs-XLA tokens on this batch, and all-zero
        # features make every logit a tie (ill-conditioned verdict)
        if buckets is None:
            buckets = list(self._buckets)  # EVERY dispatchable shape: an
            # unwarmed middle bucket would stall the single batcher
            # thread for the remote-compile duration mid-traffic
        started = bool(self._threads) and self._threads[0].is_alive()
        if self._extractor is not None:
            if image_buckets is None:
                image_buckets = list(self._extract_buckets)
            for eb in image_buckets:
                px = rng.integers(0, 255, size=(eb, 224, 224, 3)).astype(np.uint8)
                if started:
                    self._wait_warm(_Pending(None, 0, pixels=px))
                else:
                    self._extractor(px, batch_size=eb)
        samples = [_parse_sample(dict(s), self._max_samples)
                   for s in sample_configs]
        for b in buckets:
            feats = rng.standard_normal((b, feature_dim)).astype(np.float32)
            for beam in beam_sizes:
                if started:
                    self._wait_warm(_Pending(feats, beam))
                else:
                    self._cap.caption(feats, beam_size=beam)
            for s in samples:
                if started:
                    self._wait_warm(_Pending(feats, 0, sample=s))
                else:
                    t, k, tp, r, seed = s
                    self._cap.sample_captions(
                        feats, temperature=t, top_k=k, top_p=tp,
                        num_samples=r, seed=seed)
        return self

    def _await(self, p: _Pending) -> None:
        """Wait for the batcher to resolve an enqueued pending, rescuing
        the stop/enqueue race: if stop() drained the queue between the
        caller's put and the batcher's death, nobody will ever set the
        event. A dead batcher with the event unset is exact proof of
        abandonment whether or not stop() ran (a live batcher may still
        deliver); shared by do_POST and warmup."""
        while not p.event.wait(0.25):
            batcher = self._threads[0] if self._threads else None
            if batcher is None or not batcher.is_alive():
                p.error = p.error or "server stopped"
                break

    def _wait_warm(self, p: _Pending) -> None:
        """Route one warmup work item through the batcher queue — the
        one batcher thread owns ALL device work once traffic is live (a
        direct call would race it, and race the verified-dispatch
        canary)."""
        self._queue.put(p)
        self._await(p)
        if p.error is not None:
            raise RuntimeError(f"warmup failed: {p.error}")

    def start(self):
        self._threads = [
            threading.Thread(target=self._batcher, daemon=True),
            threading.Thread(target=self._httpd.serve_forever, daemon=True),
        ]
        for t in self._threads:
            t.start()
        return self

    def stop(self):
        self._stop.set()
        if self._threads:
            # only after start(): BaseServer.shutdown() blocks on an
            # event that serve_forever() alone sets — calling it on a
            # never-started server deadlocks forever
            self._httpd.shutdown()
        self._httpd.server_close()
        for t in self._threads:
            t.join(timeout=5)
        # fail anything still queued/carried so no handler thread is
        # stranded in event.wait()
        leftovers = [] if self._carry is None else [self._carry]
        self._carry = None
        while True:
            try:
                leftovers.append(self._queue.get_nowait())
            except queue.Empty:
                break
        for p in leftovers:
            p.error = "server stopped"
            p.event.set()
        # A handler that raced past its _stop check may still enqueue
        # AFTER this drain — its rescue loop in do_POST detects the dead
        # batcher and resolves itself, so no second pass is needed here.


def main(argv=None, block: bool = True):
    """``python -m image_captioning_through_rl_tpu.server`` — serve a
    trained model over HTTP. ``block=False`` returns the started
    :class:`CaptionServer` instead of parking the main thread (tests)."""
    import argparse

    from .data.coco import load_data
    from .api import load_captioner
    from .utils.io import enable_persistent_compile_cache, get_filename
    from .utils.logging import print_green

    # the server is the most compile-heavy entrypoint (one program per
    # decode bucket x beam size, plus a VGG forward per extraction
    # bucket) — without the persistent cache every RESTART re-pays all
    # of warmup (~minutes per bucket on remote-compile backends)
    enable_persistent_compile_cache()

    ap = argparse.ArgumentParser(description="Caption serving over HTTP")
    ap.add_argument("--model", required=True,
                    help="a2cNetwork checkpoint (.ckpt or reference .pt)")
    ap.add_argument("--pretrained_path", default="models_pretrained",
                    help="dir holding the policy/value sub-network checkpoints")
    ap.add_argument("--data_dir", required=True, help="COCO bundle (for the vocab)")
    ap.add_argument("--bidirectional", action="store_true", default=False)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_batch", type=int, default=1024)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--spmd", action="store_true", default=False,
                    help="shard each decode batch over all devices")
    ap.add_argument("--no_warmup", action="store_true", default=False,
                    help="skip pre-compiling the decode buckets (first "
                         "requests then pay compile latency — minutes on "
                         "remote-compile backends)")
    ap.add_argument("--warmup_beams", type=int, nargs="*", default=[0],
                    help="beam sizes to pre-compile (0 = greedy)")
    ap.add_argument("--warmup_samples", nargs="*", default=[],
                    help="sampling configs to pre-compile, as JSON "
                         "objects in the wire format's 'sample' shape, "
                         'e.g. \'{"top_k": 40, "num_samples": 3}\' — a '
                         "sampled-traffic server without these pays the "
                         "sample-scan compile at the first live request")
    ap.add_argument("--max_samples", type=int, default=64,
                    help="largest accepted num_samples per request (the "
                         "dispatched device batch is bucket*num_samples "
                         "rows, and each distinct value compiles its own "
                         "program)")
    ap.add_argument("--vgg_weights", default="",
                    help="VGG16 weights (.pt torchvision layout or .ckpt); "
                         "enables the raw-image endpoint (POST /caption "
                         "with images_b64)")
    ap.add_argument("--pca", default="",
                    help="fitted PCA projection .npz mapping fc7 to the "
                         "model's input dim (cli/extract writes one)")
    ap.add_argument("--vgg_bf16", action="store_true",
                    help="run the VGG16 extraction stack in bfloat16 — "
                         "half the HBM traffic of the conv/fc layers; "
                         "features drift at bf16 rounding level (use a "
                         "PCA basis fitted on same-dtype features)")
    ap.add_argument("--max_body_mb", type=float, default=256.0,
                    help="largest accepted request body (413 beyond it; "
                         "a multi-GB body would be buffered wholesale on "
                         "the handler thread)")
    ap.add_argument("--extract_batch", type=int, default=64,
                    help="largest VGG extraction bucket; warmup compiles "
                         "one conv program per power-of-two bucket up to "
                         "this (each first-time compile runs minutes on a "
                         "remote-compile backend — lower it for a "
                         "single-image workload)")
    args = ap.parse_args(argv)

    import os

    data = load_data(base_dir=args.data_dir, max_train=1)
    network_paths = {
        k: os.path.join(args.pretrained_path,
                        get_filename(f"{n}Network.ckpt", args.bidirectional, None))
        for k, n in (("policy_network", "policy"), ("value_network", "value"),
                     ("reward_network", "reward"))
    }
    mesh = None
    if args.spmd:
        from .parallel import make_mesh

        mesh = make_mesh()
    cap = load_captioner(args.model, data, network_paths, args.bidirectional,
                         mesh=mesh)
    extractor = None
    if args.pca and not args.vgg_weights:
        # a long-running server must not silently caption with RANDOM
        # VGG weights (the interactive CLI's warn-and-continue fallback)
        ap.error("--pca requires --vgg_weights: the raw-image endpoint "
                 "needs real VGG16 weights")
    if args.vgg_weights:
        from .api import load_feature_extractor
        from .parallel.sharding import _spans_processes

        # extraction shards over the chips of ONE process; on a
        # multi-host mesh each host decodes its own request's pixels
        ext_mesh = (mesh if mesh is not None and not _spans_processes(mesh)
                    else None)
        extractor = load_feature_extractor(weights=args.vgg_weights,
                                           pca=args.pca, bf16=args.vgg_bf16,
                                           mesh=ext_mesh)
    srv = CaptionServer(cap, host=args.host, port=args.port,
                        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
                        extractor=extractor, extract_batch=args.extract_batch,
                        max_body_mb=args.max_body_mb,
                        max_samples=args.max_samples)
    if not args.no_warmup:
        print_green("[Serving] warming decode buckets (pre-compiling; the "
                    "first compile on a fresh cache can take minutes)")
        srv.warmup(cap._cfg.input_dim, beam_sizes=tuple(args.warmup_beams),
                   sample_configs=[json.loads(s) for s in args.warmup_samples])
    srv.start()
    print_green(f"[Serving] captioning at http://{srv.host}:{srv.port} "
                f"(POST /caption, GET /healthz, GET /stats)")
    if not block:
        return srv
    # container orchestrators stop services with SIGTERM: drain the
    # batcher and answer queued work (503) instead of dying mid-request
    import signal

    terminated = threading.Event()
    prev = signal.signal(signal.SIGTERM, lambda *_: terminated.set())
    try:
        while not terminated.is_set():
            terminated.wait(3600)
    except KeyboardInterrupt:
        pass
    finally:
        signal.signal(signal.SIGTERM, prev)
        print_green("[Serving] shutting down")
        srv.stop()


if __name__ == "__main__":
    main()

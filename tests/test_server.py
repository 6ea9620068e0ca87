"""Caption HTTP server: correctness, co-batching, error paths."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from image_captioning_through_rl_tpu.api import Captioner
from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c
from image_captioning_through_rl_tpu.server import CaptionServer

CFG = NetConfig(vocab_size=28, input_dim=10, wordvec_dim=8, hidden_dim=8,
                max_seq_len=7)


@pytest.fixture(scope="module")
def server():
    params = a2c.init(jax.random.PRNGKey(0), CFG)
    idx_to_word = {i: f"w{i}" for i in range(CFG.vocab_size)}
    cap = Captioner(params, CFG, idx_to_word)
    srv = CaptionServer(cap, port=0, max_wait_ms=20)
    srv.start()
    yield srv, cap
    srv.stop()


def _post(srv, payload, timeout=30):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/caption",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_caption_matches_direct_captioner(server, rng_np):
    srv, cap = server
    feats = rng_np.standard_normal((3, CFG.input_dim)).astype(np.float32)
    got = _post(srv, {"features": feats.tolist()})["captions"]
    want = cap.caption(feats)
    assert got == want

    # beam request routes through the beam decoder
    got_b = _post(srv, {"features": feats.tolist(), "beam_size": 2})["captions"]
    want_b = cap.caption(feats, beam_size=2)
    assert got_b == want_b

    # single vector (1-D) is accepted
    one = _post(srv, {"features": feats[0].tolist()})["captions"]
    assert one == want[:1]


def _post_bin(srv, feats, beam=None, timeout=30):
    headers = {"Content-Type": "application/octet-stream"}
    if beam is not None:
        headers["X-Beam-Size"] = str(beam)
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/caption",
        data=np.ascontiguousarray(feats, dtype="<f4").tobytes(),
        headers=headers,
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_binary_features_endpoint(server, rng_np):
    """Raw little-endian f32 rows (Content-Type: application/octet-stream)
    answer identically to the JSON path — the binary path exists because
    JSON-encoding dense feature rows dominates request latency."""
    srv, cap = server
    feats = rng_np.standard_normal((3, CFG.input_dim)).astype(np.float32)
    got = _post_bin(srv, feats)["captions"]
    assert got == _post(srv, {"features": feats.tolist()})["captions"]

    # beam size rides the X-Beam-Size header
    got_b = _post_bin(srv, feats, beam=2)["captions"]
    assert got_b == cap.caption(feats, beam_size=2)

    # row-count inference: a single row is one caption
    one = _post_bin(srv, feats[0])["captions"]
    assert one == got[:1]


def test_binary_features_bad_length_is_400(server):
    srv, _ = server
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/caption",
        data=b"\x00" * (4 * CFG.input_dim + 3),  # not a row multiple
        headers={"Content-Type": "application/octet-stream"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400
    # empty body is refused too, with the shape contract in the message
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/caption", data=b"",
        headers={"Content-Type": "application/octet-stream"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_concurrent_requests_cobatch(server, rng_np):
    """Concurrent clients coalesce into shared device dispatches and
    each still receives exactly its own rows."""
    srv, cap = server
    n_clients = 8
    feats = [rng_np.standard_normal((2, CFG.input_dim)).astype(np.float32)
             for _ in range(n_clients)]
    results = [None] * n_clients

    def call(i):
        results[i] = _post(srv, {"features": feats[i].tolist()})["captions"]

    before = srv.snapshot_stats().get("batches", 0)
    threads = [threading.Thread(target=call, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for i in range(n_clients):
        assert results[i] == cap.caption(feats[i]), i
    stats = srv.snapshot_stats()
    # co-batching happened: fewer dispatches than clients, and at least
    # one batch held rows from several requests
    assert stats["batches"] - before < n_clients
    assert stats["max_batch_rows"] > 2


def test_healthz_stats_and_errors(server):
    srv, _ = server
    with urllib.request.urlopen(
        f"http://{srv.host}:{srv.port}/healthz", timeout=10
    ) as r:
        h = json.loads(r.read())
    assert h["ok"] is True and h["devices"] >= 1

    with urllib.request.urlopen(
        f"http://{srv.host}:{srv.port}/stats", timeout=10
    ) as r:
        s = json.loads(r.read())
    assert s["requests"] >= 1 and "latency_p50_ms" in s

    # malformed request -> 400 with an error message
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/caption",
        data=b'{"features": "nope"}',
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_server_cli_main_serves_from_checkpoints(tmp_path, rng_np, monkeypatch):
    """python -m ...server --model <ckpt> --data_dir <bundle> end-to-end:
    load checkpoints, serve, answer a request."""
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.models import policy, value
    from image_captioning_through_rl_tpu.train import checkpoint as ckpt
    import image_captioning_through_rl_tpu.server as server_mod
    import image_captioning_through_rl_tpu.train.loops as loops

    coco = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=4,
                               num_val_images=2, vocab_size=28, feature_dim=10,
                               seed=3)
    data = load_data(coco)
    cfg = NetConfig(vocab_size=len(data.word_to_idx), input_dim=10,
                    wordvec_dim=8, hidden_dim=8, max_seq_len=7)
    pp = policy.init(jax.random.PRNGKey(0), cfg)
    vp = value.init(jax.random.PRNGKey(1), cfg)
    pre = tmp_path / "models_pretrained"
    ckpt.save_pytree(pp, str(pre / "policyNetwork.ckpt"))
    ckpt.save_pytree(vp, str(pre / "valueNetwork.ckpt"))
    ckpt.save_pytree({"policy": pp, "value": vp}, str(pre / "a2cNetwork.ckpt"))

    # the module's load path needs the fixture-dim cfg (CLI-test pattern)
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: cfg)
    srv = server_mod.main([
        "--model", str(pre / "a2cNetwork.ckpt"),
        "--pretrained_path", str(pre),
        "--data_dir", coco, "--port", "0",
        "--extract_batch", "16",
    ], block=False)
    # --extract_batch caps the extraction buckets (each is a separate
    # VGG conv compile at warmup — minutes each on remote backends)
    assert srv._extract_buckets[-1] == 16
    try:
        feats = rng_np.standard_normal((2, 10)).astype(np.float32)
        out = _post(srv, {"features": feats.tolist()})
        assert len(out["captions"]) == 2
        assert all(c.startswith("<START>") for c in out["captions"])
        # the serving CLI must configure the persistent compile cache —
        # it is the most compile-heavy entrypoint, and without it every
        # server RESTART re-pays all of warmup (minutes per bucket on
        # remote-compile backends)
        import os

        assert (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or jax.config.jax_compilation_cache_dir)
    finally:
        srv.stop()


def test_server_cli_forwards_vgg_bf16(tmp_path, monkeypatch):
    """--vgg_bf16 must reach load_feature_extractor (a silently dropped
    flag would serve f32 while the operator believes bf16 is on)."""
    from image_captioning_through_rl_tpu import api
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    import image_captioning_through_rl_tpu.server as server_mod
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.models import policy, value
    from image_captioning_through_rl_tpu.train import checkpoint as ckpt

    coco = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=4,
                               num_val_images=2, vocab_size=28, feature_dim=10,
                               seed=3)
    data = load_data(coco)
    cfg = NetConfig(vocab_size=len(data.word_to_idx), input_dim=10,
                    wordvec_dim=8, hidden_dim=8, max_seq_len=7)
    pp = policy.init(jax.random.PRNGKey(0), cfg)
    vp = value.init(jax.random.PRNGKey(1), cfg)
    pre = tmp_path / "models_pretrained"
    ckpt.save_pytree(pp, str(pre / "policyNetwork.ckpt"))
    ckpt.save_pytree(vp, str(pre / "valueNetwork.ckpt"))
    ckpt.save_pytree({"policy": pp, "value": vp}, str(pre / "a2cNetwork.ckpt"))
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: cfg)

    seen = {}

    def fake_loader(weights="", pca="", bf16=False, mesh=None):
        seen["bf16"] = bf16

        class _Ext:
            dim = 10
        return _Ext()

    monkeypatch.setattr(api, "load_feature_extractor", fake_loader)
    srv = server_mod.main([
        "--model", str(pre / "a2cNetwork.ckpt"),
        "--pretrained_path", str(pre),
        "--data_dir", coco, "--port", "0", "--no_warmup",
        "--vgg_weights", "ignored-by-stub.ckpt", "--vgg_bf16",
    ], block=False)
    try:
        assert seen == {"bf16": True}
    finally:
        srv.stop()


def test_bucketing_pads_and_slices(server, rng_np):
    """Co-batches pad to power-of-two buckets (one compiled program per
    bucket, the TPU static-shape rule) and padding rows are sliced off."""
    srv, cap = server
    assert srv._buckets[0] >= 1 and all(
        b == srv._buckets[0] * 2**i for i, b in enumerate(srv._buckets[:-1]))
    for n in (1, 3, 9):  # below, inside, above the first bucket
        feats = rng_np.standard_normal((n, CFG.input_dim)).astype(np.float32)
        got = _post(srv, {"features": feats.tolist()})["captions"]
        assert got == cap.caption(feats)


def test_wrong_feature_dim_rejected_before_batching(server):
    """A request whose feature width mismatches the model is rejected
    with 400 at the door — it must never reach the batcher, where a
    mixed-width concatenate would kill the serving thread."""
    srv, _ = server
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/caption",
        data=json.dumps({"features": [[1.0, 2.0]]}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400
    # server still alive and serving
    feats = np.zeros((1, CFG.input_dim), np.float32)
    assert len(_post(srv, {"features": feats.tolist()})["captions"]) == 1


def test_oversized_request_splits_into_buckets(rng_np):
    """A single request larger than max_batch dispatches in bucket-sized
    chunks (no unbucketed shapes), returning all rows in order."""
    params = a2c.init(jax.random.PRNGKey(1), CFG)
    idx_to_word = {i: f"w{i}" for i in range(CFG.vocab_size)}
    cap = Captioner(params, CFG, idx_to_word)
    srv = CaptionServer(cap, port=0, max_batch=4, min_bucket=2, max_wait_ms=1)
    srv.start()
    try:
        feats = rng_np.standard_normal((10, CFG.input_dim)).astype(np.float32)
        got = _post(srv, {"features": feats.tolist()})["captions"]
        assert got == cap.caption(feats)
    finally:
        srv.stop()


def test_batcher_error_counts_and_stop_rejects(rng_np):
    """A decode failure resolves the request with 500 and bumps the
    errors counter; once stop() begins, new requests get 503 instead of
    enqueueing into a dead batcher."""
    params = a2c.init(jax.random.PRNGKey(3), CFG)
    cap = Captioner(params, CFG, {i: f"w{i}" for i in range(CFG.vocab_size)})
    srv = CaptionServer(cap, port=0, max_wait_ms=1)
    srv.start()
    try:
        feats = rng_np.standard_normal((2, CFG.input_dim)).astype(np.float32)
        real_caption = cap.caption

        def boom(*a, **k):
            raise RuntimeError("injected decode failure")

        cap.caption = boom
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/caption",
            data=json.dumps({"features": feats.tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 500
        assert "injected decode failure" in json.loads(ei.value.read())["error"]
        stats = srv.snapshot_stats()
        assert stats["errors"] == 1 and stats["requests"] == 1

        # server recovered: the next request succeeds
        cap.caption = real_caption
        assert len(_post(srv, {"features": feats.tolist()})["captions"]) == 2

        # stopping flag up -> requests bounce with 503 at the door
        srv._stop.set()
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 503
    finally:
        srv.stop()


def test_stop_fails_queued_requests():
    """stop() must not strand handler threads: queued work resolves with
    an error instead of waiting forever."""
    from image_captioning_through_rl_tpu.server import _Pending

    params = a2c.init(jax.random.PRNGKey(2), CFG)
    cap = Captioner(params, CFG, {i: f"w{i}" for i in range(CFG.vocab_size)})
    srv = CaptionServer(cap, port=0)
    # never started: enqueue directly, then stop
    p = _Pending(np.zeros((1, CFG.input_dim), np.float32), 0)
    srv._queue.put(p)
    srv.start()
    srv.stop()
    assert p.event.wait(timeout=10)
    assert p.result is not None or p.error is not None


def test_stop_before_start_returns():
    """stop() on a never-started server must not deadlock in
    BaseServer.shutdown() (its event is only set by serve_forever)."""
    params = a2c.init(jax.random.PRNGKey(2), CFG)
    cap = Captioner(params, CFG, {i: f"w{i}" for i in range(CFG.vocab_size)})
    srv = CaptionServer(cap, port=0)
    done = threading.Event()

    def run():
        srv.stop()
        done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert done.wait(10), "stop() deadlocked on a never-started server"


def test_warmup_after_start_routes_through_batcher(rng_np):
    """warmup() on a live server must not race the batcher thread for
    the device: it enqueues like any request (batches stat moves, and
    concurrent traffic still answers)."""
    params = a2c.init(jax.random.PRNGKey(3), CFG)
    cap = Captioner(params, CFG, {i: f"w{i}" for i in range(CFG.vocab_size)})
    srv = CaptionServer(cap, port=0, max_wait_ms=5).start()
    try:
        before = srv.snapshot_stats().get("batches", 0)
        srv.warmup(CFG.input_dim, buckets=[2])
        after = srv.snapshot_stats().get("batches", 0)
        assert after > before  # dispatched via the batcher, not directly
        out = _post(srv, {"features": rng_np.standard_normal(
            (1, CFG.input_dim)).tolist()})
        assert len(out["captions"]) == 1
    finally:
        srv.stop()


def test_server_restart_cycles(rng_np):
    """Sequential start/serve/stop cycles on fresh instances: no thread
    or socket leaks, stop() after traffic leaves nothing stranded, and
    each new server answers (production restart hygiene)."""
    params = a2c.init(jax.random.PRNGKey(4), CFG)
    cap = Captioner(params, CFG, {i: f"w{i}" for i in range(CFG.vocab_size)})
    before = threading.active_count()
    for cycle in range(3):
        srv = CaptionServer(cap, port=0, max_wait_ms=5).start()
        out = _post(srv, {"features": rng_np.standard_normal(
            (2, CFG.input_dim)).tolist()})
        assert len(out["captions"]) == 2, f"cycle {cycle}"
        srv.stop()
    # daemon threads from stopped cycles must have exited (join in stop)
    assert threading.active_count() <= before + 1


def _png_b64(rng, w=40, h=30):
    import base64
    import io

    from PIL import Image

    arr = rng.integers(0, 255, size=(h, w, 3)).astype("uint8")
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def image_server():
    """Server with a raw-image front end: random VGG16 weights + a PCA
    projection down to the model's input dim (pipeline wiring test —
    caption QUALITY needs real weights)."""
    import jax.numpy as jnp

    from image_captioning_through_rl_tpu.api import FeatureExtractor
    from image_captioning_through_rl_tpu.data.pca import PCAProjection
    from image_captioning_through_rl_tpu.models import vgg

    rng = np.random.default_rng(5)
    params = a2c.init(jax.random.PRNGKey(5), CFG)
    cap = Captioner(params, CFG, {i: f"w{i}" for i in range(CFG.vocab_size)})
    proj = PCAProjection(
        mean=jnp.zeros(4096),
        components=jnp.asarray(
            rng.standard_normal((4096, CFG.input_dim)).astype("float32")),
    )
    ext = FeatureExtractor(vgg.init(jax.random.PRNGKey(0)), projection=proj)
    srv = CaptionServer(cap, port=0, max_wait_ms=20, extractor=ext).start()
    yield srv
    srv.stop()


def test_caption_client_features_and_meta(server, rng_np):
    """CaptionClient wraps both dense-feature wire formats and the meta
    endpoints; binary and JSON answers must agree with the direct call."""
    from image_captioning_through_rl_tpu.client import CaptionClient

    srv, cap = server
    c = CaptionClient(f"http://{srv.host}:{srv.port}")
    feats = rng_np.standard_normal((3, CFG.input_dim)).astype(np.float32)
    want = cap.caption(feats)
    assert c.caption(feats) == want                      # binary path
    assert c.caption(feats, binary=False) == want        # JSON path
    assert c.caption(feats[0]) == want[:1]               # 1-D row
    assert c.caption(feats, beam_size=2) == cap.caption(feats, beam_size=2)
    assert c.healthz()["ok"] is True
    assert c.stats()["requests"] >= 4


@pytest.mark.slow
def test_caption_client_images(image_server, rng_np, tmp_path):
    """caption_images accepts paths, file objects, and raw bytes."""
    import base64
    import io

    from image_captioning_through_rl_tpu.client import CaptionClient

    c = CaptionClient(f"http://{image_server.host}:{image_server.port}",
                      timeout=300)
    raw = base64.b64decode(_png_b64(rng_np))
    p = tmp_path / "img.png"
    p.write_bytes(raw)
    out = c.caption_images([str(p), io.BytesIO(raw), raw])
    assert len(out) == 3
    assert out[0] == out[1] == out[2]  # same pixels, same caption


@pytest.mark.slow
def test_spmd_extractor_small_bucket_serves(rng_np):
    """A mesh-sharded extractor with an extraction bucket smaller than
    the chip count must warm up and serve (the bucket rounds up to the
    data-axis size instead of crashing at startup)."""
    import jax.numpy as jnp

    from image_captioning_through_rl_tpu.api import FeatureExtractor
    from image_captioning_through_rl_tpu.data.pca import PCAProjection
    from image_captioning_through_rl_tpu.models import vgg
    from image_captioning_through_rl_tpu.parallel import make_mesh

    rng = np.random.default_rng(7)
    params = a2c.init(jax.random.PRNGKey(7), CFG)
    cap = Captioner(params, CFG, {i: f"w{i}" for i in range(CFG.vocab_size)})
    proj = PCAProjection(
        mean=jnp.zeros(4096),
        components=jnp.asarray(
            rng.standard_normal((4096, CFG.input_dim)).astype("float32")),
    )
    mesh = make_mesh((8,), ("data",))
    ext = FeatureExtractor(vgg.init(jax.random.PRNGKey(0)), projection=proj,
                           mesh=mesh)
    # params were committed ONCE at construction (replicate() must pass
    # them through per call, not re-broadcast ~0.5 GB per request)
    import jax as _jax
    from jax.sharding import NamedSharding

    for leaf in _jax.tree.leaves(ext.vgg_params):
        assert isinstance(leaf.sharding, NamedSharding)
    srv = CaptionServer(cap, port=0, max_wait_ms=5, extractor=ext,
                        extract_batch=1).start()
    try:
        srv.warmup(CFG.input_dim, buckets=[1])  # bucket 1 < 8 chips
        out = _post(srv, {"images_b64": [_png_b64(rng_np)]}, timeout=300)
        assert len(out["captions"]) == 1
    finally:
        srv.stop()


def test_caption_client_rejects_3d_features(server):
    """ndim>2 must fail client-side on BOTH wire formats — the binary
    path would otherwise silently flatten to N*K rows."""
    from image_captioning_through_rl_tpu.client import CaptionClient

    srv, _ = server
    c = CaptionClient(f"http://{srv.host}:{srv.port}")
    bad = np.zeros((2, 3, CFG.input_dim), np.float32)
    with pytest.raises(ValueError, match=r"\[N, F\]"):
        c.caption(bad)
    with pytest.raises(ValueError, match=r"\[N, F\]"):
        c.caption(bad, binary=False)


def test_caption_raw_images_endpoint(image_server, rng_np):
    """POST /caption with images_b64 runs pixels -> VGG16 fc7 -> PCA ->
    decode end-to-end through the batcher."""
    out = _post(image_server, {
        "images_b64": [_png_b64(rng_np), _png_b64(rng_np, 60, 80)],
    }, timeout=300)
    assert len(out["captions"]) == 2
    assert all(c.split()[0] == "w1" for c in out["captions"])  # <START>
    stats = image_server.snapshot_stats()
    assert stats["images_extracted"] >= 2


def test_caption_images_cobatch_with_features(image_server, rng_np):
    """Image and feature requests co-batch into the same decode
    dispatch; both answer."""
    results = {}

    def img():
        results["img"] = _post(image_server, {"images_b64": [_png_b64(rng_np)]},
                               timeout=300)

    def feat():
        results["feat"] = _post(image_server, {
            "features": rng_np.standard_normal((2, CFG.input_dim)).tolist()},
            timeout=300)

    ts = [threading.Thread(target=img), threading.Thread(target=feat)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(results["img"]["captions"]) == 1
    assert len(results["feat"]["captions"]) == 2


def test_caption_images_without_extractor_is_400(server, rng_np):
    import urllib.error

    srv, _ = server
    try:
        _post(srv, {"images_b64": [_png_b64(rng_np)]})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "extractor" in e.read().decode()


def test_extractor_dim_mismatch_rejected_at_init():
    from image_captioning_through_rl_tpu.api import FeatureExtractor
    from image_captioning_through_rl_tpu.models import vgg

    params = a2c.init(jax.random.PRNGKey(6), CFG)
    cap = Captioner(params, CFG, {i: f"w{i}" for i in range(CFG.vocab_size)})
    ext = FeatureExtractor(vgg.init(jax.random.PRNGKey(0)))  # raw 4096-d
    with pytest.raises(ValueError, match="4096"):
        CaptionServer(cap, port=0, extractor=ext)


def test_warmup_with_extractor_precompiles_images(image_server):
    """warmup(image_buckets=[8]) on a live image server routes a padded
    pixel batch through the batcher (warming the VGG program) without
    disturbing traffic; image_buckets=[] skips the VGG warm."""
    before = image_server.snapshot_stats().get("images_extracted", 0)
    image_server.warmup(CFG.input_dim, buckets=[8], image_buckets=[8])
    after = image_server.snapshot_stats().get("images_extracted", 0)
    assert after >= before + 8
    image_server.warmup(CFG.input_dim, buckets=[8], image_buckets=[])
    assert image_server.snapshot_stats()["images_extracted"] == after


def test_oversized_body_rejected_413(server):
    """Bodies beyond max_body_mb are refused BEFORE being read — a
    multi-GB upload would otherwise be buffered wholesale on the
    handler thread."""
    srv0, cap = server
    tiny = CaptionServer(cap, port=0, max_body_mb=0.001).start()  # ~1 KiB
    try:
        feats = np.zeros((40, CFG.input_dim), np.float32)  # body >> 1 KiB
        try:
            _post(tiny, {"features": feats.tolist()})
            raise AssertionError("expected HTTP 413")
        except urllib.error.HTTPError as e:
            assert e.code == 413
            assert "max_body_mb" in e.read().decode()
        # normal-size requests still answer on the same server
        small = np.zeros((1, CFG.input_dim), np.float32)
        assert len(_post(tiny, {"features": small.tolist()})["captions"]) == 1
    finally:
        tiny.stop()


@pytest.mark.slow
def test_sigterm_drains_and_exits_cleanly(tmp_path):
    """Container orchestrators stop services with SIGTERM: the blocking
    CLI must shut the batcher down and exit 0, not die mid-request."""
    import os
    import signal
    import subprocess
    import sys
    import time as _time

    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.models import policy, value
    from image_captioning_through_rl_tpu.train import checkpoint as ckpt

    # default-dim fixture so the subprocess's _cfg_for matches the
    # checkpoints without monkeypatching
    coco = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=4,
                               num_val_images=2, vocab_size=24,
                               feature_dim=512, seed=0)
    data = load_data(coco)
    cfg = NetConfig.for_vocab(data.word_to_idx)
    pre = tmp_path / "pre"
    pp = policy.init(jax.random.PRNGKey(0), cfg)
    vp = value.init(jax.random.PRNGKey(1), cfg)
    ckpt.save_pytree(pp, str(pre / "policyNetwork.ckpt"))
    ckpt.save_pytree(vp, str(pre / "valueNetwork.ckpt"))
    ckpt.save_pytree({"policy": pp, "value": vp}, str(pre / "a2cNetwork.ckpt"))

    proc = subprocess.Popen(
        [sys.executable, "-m", "image_captioning_through_rl_tpu.server",
         "--model", str(pre / "a2cNetwork.ckpt"), "--pretrained_path", str(pre),
         "--data_dir", coco, "--port", "0", "--no_warmup"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=dict(os.environ), cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    lines = []

    def _reader():
        for line in proc.stdout:
            lines.append(line)

    t = threading.Thread(target=_reader, daemon=True)
    t.start()
    try:
        deadline = _time.time() + 300
        while _time.time() < deadline:
            if any("captioning at" in ln for ln in lines):
                break
            if proc.poll() is not None:
                raise AssertionError("server died before ready:\n" + "".join(lines))
            _time.sleep(0.25)
        else:
            raise AssertionError("server never became ready:\n" + "".join(lines))
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
        t.join(timeout=10)
        assert proc.returncode == 0, "".join(lines)
        assert any("shutting down" in ln for ln in lines), "".join(lines)
    finally:
        if proc.poll() is None:
            proc.kill()


def _raw_http(srv, request_bytes, timeout=15):
    """Send a hand-crafted HTTP request; return the raw response bytes
    (empty if the server closed without replying)."""
    import socket

    with socket.create_connection((srv.host, srv.port), timeout=timeout) as s:
        s.sendall(request_bytes)
        s.shutdown(socket.SHUT_WR)
        out = b""
        while True:
            try:
                chunk = s.recv(65536)
            except OSError:
                break
            if not chunk:
                break
            out += chunk
    return out


def test_malformed_content_length_answers_400(server):
    """A non-numeric or negative Content-Length must get a clean 400 —
    negative values especially must never reach rfile.read(n), where
    BufferedReader treats them as read-to-EOF (unbounded buffering)."""
    srv, _ = server
    for bad in (b"abc", b"-1"):
        resp = _raw_http(srv, b"POST /caption HTTP/1.1\r\nHost: x\r\n"
                              b"Content-Length: " + bad + b"\r\n\r\n")
        assert b" 400 " in resp.split(b"\r\n", 1)[0], (bad, resp[:100])
        assert b"Content-Length" in resp


def test_oversized_body_413_readable_mid_stream(server):
    """The 413 must reach a client still streaming its body (the server
    drains a bounded amount so closing doesn't RST the response away)."""
    srv, cap = server
    tiny = CaptionServer(cap, port=0, max_body_mb=0.001).start()  # ~1 KiB
    try:
        body = b"x" * 300_000  # well past the cap AND socket buffers
        resp = _raw_http(
            tiny, b"POST /caption HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: %d\r\n\r\n" % len(body) + body)
        assert b" 413 " in resp.split(b"\r\n", 1)[0], resp[:100]
        assert b"max_body_mb" in resp
    finally:
        tiny.stop()


def test_image_count_capped_per_request(image_server):
    """The body-size cap does not bound DECODED pixels (~750x a small
    base64 JPEG), so the image count is capped at max_batch."""
    blobs = ["eA=="] * (image_server._max_batch + 1)
    try:
        _post(image_server, {"images_b64": blobs})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "limit" in e.read().decode()


def test_bad_server_limits_rejected_at_init(server):
    """extract_batch < 1 would make every image request fail at runtime
    (range step 0) after a silently-empty warmup; nonsensical body caps
    would 413 everything — both must fail at construction."""
    _, cap = server
    with pytest.raises(ValueError, match="extract_batch"):
        CaptionServer(cap, port=0, extract_batch=0)
    with pytest.raises(ValueError, match="max_body_mb"):
        CaptionServer(cap, port=0, max_body_mb=0)


def test_sampling_endpoint_both_wire_formats(server, rng_np):
    """Seeded stochastic decode answers identically on the JSON and
    binary paths and matches the direct Captioner call. 8 rows = one
    full bucket, so no padding rows enter the batch (padding changes
    batch composition and therefore the per-row Gumbel draws)."""
    from image_captioning_through_rl_tpu.client import CaptionClient

    srv, cap = server
    c = CaptionClient(f"http://{srv.host}:{srv.port}")
    feats = rng_np.standard_normal((8, CFG.input_dim)).astype(np.float32)
    sample = {"temperature": 1.5, "top_k": 4, "seed": 7}
    want = cap.sample_captions(feats, temperature=1.5, top_k=4, seed=7)
    assert c.caption(feats, sample=sample) == want            # binary
    assert c.caption(feats, sample=sample, binary=False) == want
    # n-best: one R-list per row, matching the direct call
    multi = c.caption(
        feats, sample={"num_samples": 2, "temperature": 1.5, "seed": 3})
    assert len(multi) == 8 and all(len(r) == 2 for r in multi)
    assert multi == cap.sample_captions(
        feats, num_samples=2, temperature=1.5, seed=3)


def test_spmd_server_sampling_parity(server, rng_np):
    """A mesh-holding (--spmd) server answers sample requests sharded
    over the data axis AND token-identical to the single-device server
    at equal seeds — sampling gets the same sharding contract as
    greedy/beam instead of silently serving one chip."""
    from image_captioning_through_rl_tpu.client import CaptionClient
    from image_captioning_through_rl_tpu.parallel import make_mesh

    _, cap_single = server
    params = a2c.init(jax.random.PRNGKey(0), CFG)  # same seed as fixture
    idx_to_word = {i: f"w{i}" for i in range(CFG.vocab_size)}
    meshed = Captioner(params, CFG, idx_to_word,
                       mesh=make_mesh((8,), ("data",)))
    srv = CaptionServer(meshed, port=0).start()
    try:
        c = CaptionClient(f"http://{srv.host}:{srv.port}")
        feats = rng_np.standard_normal((8, CFG.input_dim)).astype(np.float32)
        sample = {"temperature": 1.5, "top_k": 4, "seed": 7}
        got = c.caption(feats, sample=sample)
        want = cap_single.sample_captions(feats, temperature=1.5, top_k=4,
                                          seed=7)
        assert got == want
        multi = c.caption(feats, sample={"num_samples": 2, "seed": 3})
        assert multi == cap_single.sample_captions(feats, num_samples=2,
                                                   seed=3)
    finally:
        srv.stop()


def test_sampling_request_validation(server, rng_np):
    """beam_size+sample conflicts and malformed sample configs are 400s
    on both wire formats (non-finite values especially: JSON's NaN
    passes a plain ``t < 0`` check and would 200-OK garbage captions;
    inf silently samples uniformly)."""
    from image_captioning_through_rl_tpu.client import CaptionClient

    srv, _ = server
    c = CaptionClient(f"http://{srv.host}:{srv.port}")
    feats = rng_np.standard_normal((2, CFG.input_dim)).astype(np.float32)
    for kw in (dict(beam_size=2, sample={"temperature": 1.0}),
               dict(sample={"top_p": 0.0}),
               dict(sample={"top_p": float("nan")}),
               dict(sample={"temperature": float("nan")}),
               dict(sample={"temperature": float("inf")}),
               dict(sample={"num_samples": 0}),
               dict(sample={"num_samples": srv._max_samples + 1})):
        for binary in (True, False):
            with pytest.raises(urllib.error.HTTPError) as ei:
                c.caption(feats, binary=binary, **kw)
            assert ei.value.code == 400, (kw, binary)

    # unknown keys: the JSON path 400s server-side; the binary client
    # has no header mapping for them and refuses before any bytes go out
    with pytest.raises(urllib.error.HTTPError) as ei:
        c.caption(feats, binary=False, sample={"temprature": 1.0})
    assert ei.value.code == 400
    with pytest.raises(ValueError, match="temprature"):
        c.caption(feats, binary=True, sample={"temprature": 1.0})


def test_sampling_chunk_seeds_differ(rng_np):
    """An oversized sampled request split into max_batch chunks derives
    a per-chunk seed (seed + row offset): identical rows in different
    chunks must NOT draw identical noise (SERVING.md's reproducibility
    rule is per dispatch)."""
    params = a2c.init(jax.random.PRNGKey(0), CFG)
    idx_to_word = {i: f"w{i}" for i in range(CFG.vocab_size)}
    cap = Captioner(params, CFG, idx_to_word)
    srv = CaptionServer(cap, port=0, max_batch=4, min_bucket=4).start()
    try:
        row = rng_np.standard_normal((1, CFG.input_dim)).astype(np.float32)
        feats = np.repeat(row, 8, axis=0)  # 2 chunks of 4 identical rows
        got = _post(srv, {"features": feats.tolist(),
                          "sample": {"temperature": 3.0, "seed": 5}},
                    )["captions"]
        assert len(got) == 8
        assert got[:4] != got[4:], "chunks reused the request seed"
        # chunk 1 matches the direct call at the request seed, chunk 2
        # at seed + its row offset
        assert got[:4] == cap.sample_captions(feats[:4], temperature=3.0,
                                              seed=5)
        assert got[4:] == cap.sample_captions(feats[4:], temperature=3.0,
                                              seed=9)
    finally:
        srv.stop()


def test_warmup_compiles_sample_configs(server):
    """warmup(sample_configs=...) pre-compiles the sample scan per
    bucket (counted as batcher dispatches) and validates the configs
    with the same rules as live requests."""
    srv, _ = server
    before = srv.snapshot_stats()["batches"]
    srv.warmup(CFG.input_dim, beam_sizes=(), buckets=[8],
               sample_configs=[{"top_k": 3, "num_samples": 2}])
    assert srv.snapshot_stats()["batches"] == before + 1
    with pytest.raises(ValueError, match="num_samples"):
        srv.warmup(CFG.input_dim, beam_sizes=(), buckets=[8],
                   sample_configs=[{"num_samples": 0}])


def test_sampling_images_endpoint(image_server):
    """Raw-image uploads compose with sampling (extract -> sample)."""
    from image_captioning_through_rl_tpu.client import CaptionClient

    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (40, 30), (120, 40, 200)).save(buf, format="JPEG")
    c = CaptionClient(f"http://{image_server.host}:{image_server.port}")
    out = c.caption_images([buf.getvalue()],
                           sample={"num_samples": 3, "temperature": 2.0,
                                   "seed": 1})
    assert len(out) == 1 and len(out[0]) == 3
    assert all(isinstance(s, str) for s in out[0])

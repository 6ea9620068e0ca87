"""SPMD equivalence: sharded steps must match single-device numerics.

Runs on the 8-virtual-device CPU mesh from conftest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.decode import greedy_decode
from image_captioning_through_rl_tpu.models import a2c, policy, reward
from image_captioning_through_rl_tpu.parallel import (
    a2c_param_spec,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)
from image_captioning_through_rl_tpu.train import optim, steps

from torch_oracles import rand_captions, rand_features

VOCAB = 32
CFG = NetConfig(vocab_size=VOCAB, input_dim=8, wordvec_dim=8, hidden_dim=8, max_seq_len=9)
N = 16  # divisible by 8 devices


@pytest.fixture
def batch(rng_np):
    feats = jnp.asarray(rand_features(rng_np, N, CFG.input_dim))
    caps = jnp.asarray(rand_captions(rng_np, N, CFG.max_seq_len, VOCAB).astype(np.int32))
    return feats, caps


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_policy_step_dp_matches_single_device(batch):
    feats, caps = batch
    params = policy.init(jax.random.PRNGKey(0), CFG)
    tx = optim.adam(1e-3)
    step = steps.make_policy_step(CFG, tx)

    p1, _, loss1 = step(params, tx.init(params), feats, caps)

    mesh = make_mesh((8,), ("data",))
    params_r = replicate(mesh, params)
    opt_r = replicate(mesh, tx.init(params))
    feats_s, caps_s = shard_batch(mesh, feats, caps)
    p2, _, loss2 = step(params_r, opt_r, feats_s, caps_s)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_a2c_step_dp_tp_matches_single_device(batch):
    """2-D mesh: batch over 'data', vocab tensor-parallel over 'model'."""
    feats, caps = batch
    params = a2c.init(jax.random.PRNGKey(1), CFG)
    rparams = reward.init(jax.random.PRNGKey(2), CFG)
    tx = optim.adam(1e-4)
    step = steps.make_a2c_step(CFG, tx)
    key = jax.random.PRNGKey(3)

    p1, _, stats1 = step(params, tx.init(params), rparams, feats, caps, jnp.int32(1), key)

    mesh = make_mesh((4, 2), ("data", "model"))
    params_s = shard_params(mesh, params, a2c_param_spec(params))
    rparams_r = replicate(mesh, rparams)
    opt_s = jax.tree.map(lambda x: x, tx.init(params_s))
    feats_s, caps_s = shard_batch(mesh, feats, caps)
    p2, _, stats2 = step(params_s, opt_s, rparams_r, feats_s, caps_s, jnp.int32(1), key)

    np.testing.assert_allclose(float(stats1.loss), float(stats2.loss), rtol=1e-4)
    np.testing.assert_allclose(
        float(stats1.mean_reward), float(stats2.mean_reward), rtol=1e-4, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)


def test_greedy_decode_dp_matches_single_device(batch):
    feats, caps = batch
    params = policy.init(jax.random.PRNGKey(4), CFG)
    toks1 = greedy_decode(params, CFG, feats, caps[:, 0])

    mesh = make_mesh((8,), ("data",))
    feats_s = shard_batch(mesh, feats)
    start_s = shard_batch(mesh, caps[:, 0])
    toks2 = greedy_decode(replicate(mesh, params), CFG, feats_s, start_s)
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))


@pytest.mark.slow
def test_sharded_decode_matches_single_device(rng_np):
    """Batch-sharded greedy and per-sample beam decode over the 8-way
    data mesh must equal single-device decode token-for-token (incl.
    non-multiple batch sizes, which pad internally)."""
    from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig
    from image_captioning_through_rl_tpu.decode import beam_search, greedy_decode
    from image_captioning_through_rl_tpu.models import policy as policy_mod
    from image_captioning_through_rl_tpu.models import value as value_mod
    from image_captioning_through_rl_tpu.parallel import (
        make_mesh,
        sharded_beam_tokens,
        sharded_greedy_tokens,
    )

    cfg = NetConfig(vocab_size=30, input_dim=12, wordvec_dim=14, hidden_dim=16, max_seq_len=7)
    pp = policy_mod.init(jax.random.PRNGKey(0), cfg)
    vp = value_mod.init(jax.random.PRNGKey(1), cfg)
    n = 13  # not a multiple of 8
    feats = jnp.asarray(rand_features(rng_np, n, 12))
    start = jnp.ones(n, jnp.int32)
    mesh = make_mesh((8,), ("data",))

    ref_g = np.asarray(greedy_decode(pp, cfg, feats, start))
    got_g = np.asarray(sharded_greedy_tokens(mesh, pp, cfg, feats, start))
    np.testing.assert_array_equal(got_g, ref_g)

    dcfg = DecodeConfig(beam_size=3, max_seq_len=7)
    ref_t, _ = beam_search(pp, vp, cfg, dcfg, feats, start)
    got_t, _ = sharded_beam_tokens(mesh, pp, vp, cfg, dcfg, feats, start)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))


@pytest.mark.slow
def test_sharded_sampling_matches_single_device(rng_np):
    """Batch-sharded stochastic decode over the 8-way data mesh equals
    the single-device sample token-for-token at equal keys — for ANY
    batch size: the per-step Gumbel draw is position-keyed
    (partitionable threefry), so neither the data-axis padding nor the
    partitioning perturbs the real rows' noise."""
    from image_captioning_through_rl_tpu.config import NetConfig
    from image_captioning_through_rl_tpu.decode import sample_decode_n
    from image_captioning_through_rl_tpu.models import policy as policy_mod
    from image_captioning_through_rl_tpu.parallel import (
        make_mesh,
        sharded_sample_tokens,
    )

    cfg = NetConfig(vocab_size=30, input_dim=12, wordvec_dim=14,
                    hidden_dim=16, max_seq_len=7)
    pp = policy_mod.init(jax.random.PRNGKey(0), cfg)
    n = 13  # not a multiple of 8
    feats = jnp.asarray(rand_features(rng_np, n, 12))
    start = jnp.ones(n, jnp.int32)
    mesh = make_mesh((8,), ("data",))
    key = jax.random.PRNGKey(42)

    for kw in (dict(temperature=1.5, top_k=4),
               dict(temperature=0.8, top_p=jnp.float32(0.9))):
        ref = np.asarray(sample_decode_n(pp, cfg, feats, start, key, 1, **kw))
        got = np.asarray(sharded_sample_tokens(mesh, pp, cfg, feats, start,
                                               key, **kw))
        np.testing.assert_array_equal(got, ref[:, 0])

    # n-best tiling groups rows per image, matching sample_decode_n
    ref3 = np.asarray(sample_decode_n(pp, cfg, feats, start, key, 3,
                                      temperature=jnp.float32(2.0)))
    got3 = np.asarray(sharded_sample_tokens(mesh, pp, cfg, feats, start, key,
                                            num_samples=3, temperature=2.0))
    np.testing.assert_array_equal(got3, ref3)

    # the Captioner surface routes its mesh through the sharded path
    from image_captioning_through_rl_tpu.api import Captioner

    idx = {i: f"w{i}" for i in range(30)}
    single = Captioner(pp, cfg, idx)
    meshed = Captioner(pp, cfg, idx, mesh=mesh)
    np.testing.assert_array_equal(
        meshed.sample_tokens(feats, temperature=1.3, top_k=5, seed=9),
        single.sample_tokens(feats, temperature=1.3, top_k=5, seed=9))


@pytest.mark.parametrize(
    "bidi", [False, pytest.param(True, marks=pytest.mark.slow)])
def test_sharded_eval_writes_same_captions(tmp_path, rng_np, bidi):
    """test_a2c_network(mesh=...) produces the same dump lines as the
    single-device eval — including bidirectional models, whose mesh
    eval rides the sharded full-prefix beam."""
    from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.models import a2c
    from image_captioning_through_rl_tpu.parallel import make_mesh
    from image_captioning_through_rl_tpu.train.loops import test_a2c_network

    coco = make_synthetic_coco(str(tmp_path / "coco"), num_val_images=10,
                               vocab_size=30, feature_dim=16, seed=13)
    data = load_data(coco)
    cfg = NetConfig(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8,
                    max_seq_len=6, bidirectional=bidi)
    params = a2c.init(jax.random.PRNGKey(4), cfg)

    def run(sub, mesh):
        (tmp_path / sub).mkdir()
        paths = {
            "real_captions_path": str(tmp_path / sub / "real.txt"),
            "generated_captions_path": str(tmp_path / sub / "gen.txt"),
            "image_urls_path": str(tmp_path / sub / "urls.txt"),
        }
        test_a2c_network(
            params, cfg, data, paths, data_size=20, validation_batch_size=8,
            dcfg=DecodeConfig(beam_size=2, max_seq_len=6), seed=0, mesh=mesh,
            use_fused_kernel=False,
        )
        return open(paths["generated_captions_path"]).read()

    single = run("single", None)
    sharded = run("sharded", make_mesh((8,), ("data",)))
    assert single == sharded


def test_maybe_init_distributed_single_host_noop(monkeypatch):
    from image_captioning_through_rl_tpu.parallel import maybe_init_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_AUTO_DISTRIBUTED", raising=False)
    assert maybe_init_distributed() is False


def test_maybe_init_distributed_manual_env(monkeypatch):
    """Env-var launch form forwards coordinator info to
    jax.distributed.initialize (stubbed — really initializing would
    reconfigure this test process)."""
    import jax

    from image_captioning_through_rl_tpu.parallel import maybe_init_distributed

    seen = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        seen.update(addr=coordinator_address, n=num_processes, pid=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False, raising=False)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    maybe_init_distributed()
    assert seen == {"addr": "10.0.0.1:8476", "n": 4, "pid": 2}


def test_maybe_init_distributed_auto_env(monkeypatch):
    """JAX_AUTO_DISTRIBUTED=1 invokes the zero-argument
    jax.distributed.initialize() (Cloud TPU metadata auto-discovery) —
    stubbed, as in the manual-env test above."""
    import jax

    from image_captioning_through_rl_tpu.parallel import maybe_init_distributed

    calls = []

    def fake_init(*args, **kwargs):
        calls.append((args, kwargs))

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False, raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    monkeypatch.setenv("JAX_AUTO_DISTRIBUTED", "1")
    maybe_init_distributed()
    assert calls == [((), {})]


def test_global_batcher_2d_mesh():
    """GlobalBatcher on a (data, model) mesh: devices along the model
    axis hold IDENTICAL row slices — local_rows must dedupe them, not
    double-count (review round-3 regression)."""
    import numpy as np

    from image_captioning_through_rl_tpu.parallel import GlobalBatcher, make_mesh

    mesh = make_mesh((4, 2), ("data", "model"))
    gb = GlobalBatcher(mesh)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = gb.shard(x)
    np.testing.assert_array_equal(np.asarray(arr), x)
    s = np.arange(2 * 8 * 3, dtype=np.float32).reshape(2, 8, 3)
    arr2 = gb.shard_stacked(s)
    np.testing.assert_array_equal(np.asarray(arr2), s)


def test_global_batcher_replicate_without_data_axis():
    """replicate() is axis-agnostic: it must work on meshes that don't
    carry a 'data' axis at all (review round-3 regression)."""
    import numpy as np

    from image_captioning_through_rl_tpu.parallel import GlobalBatcher, make_mesh

    mesh = make_mesh((8,), ("model",))
    tree = {"w": np.ones((4, 4), np.float32)}
    rep = GlobalBatcher(mesh).replicate(tree)
    np.testing.assert_array_equal(np.asarray(rep["w"]), tree["w"])


def test_replicate_passthrough_when_committed():
    """Serving calls replicate the same parameter pytree per request;
    an already-committed tree must pass through untouched (no ~40 MB
    re-upload per request)."""
    import numpy as np

    from image_captioning_through_rl_tpu.parallel import make_mesh
    from image_captioning_through_rl_tpu.parallel.sharding import replicate

    mesh = make_mesh()
    tree = {"w": np.ones((4, 4), np.float32)}
    once = replicate(mesh, tree)
    again = replicate(mesh, once)
    assert again["w"] is once["w"]


def test_maybe_init_distributed_partial_env_raises(monkeypatch):
    """A partially-announced multi-host job must fail loudly — silently
    running single-host leaves the peers blocked at the coordinator."""
    import pytest

    from image_captioning_through_rl_tpu.parallel.mesh import maybe_init_distributed

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="incomplete"):
        maybe_init_distributed()


@pytest.mark.slow
def test_sharded_bidirectional_decode_matches_single_device(rng_np):
    """Bidirectional policies shard too: the mesh paths route to the
    full-prefix decode family (the backward direction re-reads the
    prefix, so there is no carried-state scan), which is just as
    batch-parallel — sharded greedy/beam/sampling must equal the
    single-device full-prefix decode token-for-token, padding included."""
    from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig
    from image_captioning_through_rl_tpu.decode import (
        beam_search_full_prefix,
        greedy_decode_full_prefix,
        sample_decode_n,
    )
    from image_captioning_through_rl_tpu.models import policy as policy_mod
    from image_captioning_through_rl_tpu.models import value as value_mod
    from image_captioning_through_rl_tpu.parallel import (
        make_mesh,
        sharded_beam_tokens,
        sharded_greedy_tokens,
        sharded_sample_tokens,
    )

    cfg = NetConfig(vocab_size=30, input_dim=12, wordvec_dim=14,
                    hidden_dim=16, max_seq_len=6, bidirectional=True)
    pp = policy_mod.init(jax.random.PRNGKey(0), cfg)
    vp = value_mod.init(jax.random.PRNGKey(1), cfg)
    n = 13  # not a multiple of 8
    feats = jnp.asarray(rand_features(rng_np, n, 12))
    start = jnp.ones(n, jnp.int32)
    mesh = make_mesh((8,), ("data",))

    ref_g = np.asarray(greedy_decode_full_prefix(pp, cfg, feats, start))
    got_g = np.asarray(sharded_greedy_tokens(mesh, pp, cfg, feats, start))
    np.testing.assert_array_equal(got_g, ref_g)

    dcfg = DecodeConfig(beam_size=3, max_seq_len=6)
    ref_t, _ = beam_search_full_prefix(pp, vp, cfg, dcfg, feats, start)
    got_t, _ = sharded_beam_tokens(mesh, pp, vp, cfg, dcfg, feats, start)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))

    key = jax.random.PRNGKey(42)
    ref_s = np.asarray(sample_decode_n(pp, cfg, feats, start, key, 1,
                                       temperature=1.2, top_k=4))
    got_s = np.asarray(sharded_sample_tokens(mesh, pp, cfg, feats, start, key,
                                             temperature=1.2, top_k=4))
    np.testing.assert_array_equal(got_s, ref_s[:, 0])


@pytest.mark.parametrize("data_size", [2, 4, 8])
def test_padded_rows_never_leak_any_remainder(rng_np, data_size):
    """_pad_to_multiple repeats the LAST row to fill the data axis
    (parallel/serve.py); the contract is that padded rows never reach
    user output. Property-tested across mesh size x batch remainder for
    the sharded decode paths — greedy, per-sample beam, sampling — by
    exact token equality against the single-device run of the same rows
    (extraction's twin: test_extract_padded_rows_never_leak below).
    Remainders: 1 (all but one row on the first chip is padding),
    data-1 (one pad row), data+1 (wraps onto a second row per chip)."""
    from image_captioning_through_rl_tpu.config import DecodeConfig
    from image_captioning_through_rl_tpu.decode import beam_search, sample_decode_n
    from image_captioning_through_rl_tpu.models import value as value_mod
    from image_captioning_through_rl_tpu.parallel import (
        sharded_beam_tokens,
        sharded_greedy_tokens,
        sharded_sample_tokens,
    )

    cfg = NetConfig(vocab_size=30, input_dim=12, wordvec_dim=14,
                    hidden_dim=16, max_seq_len=7)
    pp = policy.init(jax.random.PRNGKey(0), cfg)
    vp = value_mod.init(jax.random.PRNGKey(1), cfg)
    dcfg = DecodeConfig(beam_size=3, max_seq_len=7)
    mesh = make_mesh((data_size,), ("data",),
                     devices=jax.devices()[:data_size])
    key = jax.random.PRNGKey(9)

    for n in sorted({1, data_size - 1, data_size + 1} - {0}):
        feats = jnp.asarray(rand_features(rng_np, n, cfg.input_dim))
        start = jnp.ones(n, jnp.int32)

        ref_g = np.asarray(greedy_decode(pp, cfg, feats, start))
        got_g = np.asarray(sharded_greedy_tokens(mesh, pp, cfg, feats, start))
        np.testing.assert_array_equal(got_g, ref_g, err_msg=f"greedy n={n}")

        ref_t, ref_s = beam_search(pp, vp, cfg, dcfg, feats, start)
        got_t, got_s = sharded_beam_tokens(mesh, pp, vp, cfg, dcfg, feats, start)
        np.testing.assert_array_equal(
            np.asarray(got_t), np.asarray(ref_t), err_msg=f"beam n={n}")
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(ref_s), rtol=1e-6,
            err_msg=f"beam scores n={n}")

        # num_samples=2 exercises the repeat-then-pad layout too
        ref_n = np.asarray(sample_decode_n(
            pp, cfg, feats, start, key, 2, temperature=0.9, top_k=5))
        got_n = np.asarray(sharded_sample_tokens(
            mesh, pp, cfg, feats, start, key, num_samples=2,
            temperature=0.9, top_k=5))
        np.testing.assert_array_equal(got_n, ref_n, err_msg=f"sample n={n}")


@pytest.mark.slow
@pytest.mark.parametrize("data_size", [2, 4])
def test_extract_padded_rows_never_leak(rng_np, data_size):
    """Sharded VGG16 extraction's twin of the decode property above:
    ragged image collections (final batch padded by repeating the last
    image, batches sharded over the data axis) return exactly the
    unsharded rows at every mesh size x remainder. Mesh size 8 is
    covered by test_vgg.py::test_mesh_sharded_extraction_matches_
    single_device; VGG compute makes this slow-tier."""
    from image_captioning_through_rl_tpu.models import vgg

    params = vgg.init(jax.random.PRNGKey(2))
    n = 2 * data_size + 1  # ragged final batch: one real row + padding
    imgs = rng_np.standard_normal((n, 32, 32, 3)).astype(np.float32)
    mesh = make_mesh((data_size,), ("data",),
                     devices=jax.devices()[:data_size])
    plain = vgg.extract_features(params, imgs, batch_size=data_size)
    sharded = vgg.extract_features(params, imgs, batch_size=data_size,
                                   mesh=mesh)
    assert sharded.shape == (n, 4096)
    # sharded conv partitioning reorders float accumulation (~1e-7):
    # allclose is the leak check — a leaked PAD row would be a copy of
    # its batch's last real row, orders of magnitude off its own value
    np.testing.assert_allclose(sharded, plain, rtol=1e-3, atol=1e-5)

"""Fused Pallas sampling kernel vs the XLA scan path (interpret mode on
CPU), plus the sort-free filter-threshold machinery and the Captioner's
verified-dispatch routing (ops/pallas_sample.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.decode.sample import (
    filter_logits,
    sample_decode,
    sample_decode_n,
)
from image_captioning_through_rl_tpu.models import policy
from image_captioning_through_rl_tpu.ops.pallas_sample import (
    filter_scaled_logits,
    fused_rows_ok,
    fused_sample_decode,
    gumbel_from_bits,
    keyspace_threshold,
    monotone_keys,
    sample_step_keys,
    threefry2x32_bits,
)

from torch_oracles import rand_features

CFG = NetConfig(vocab_size=200, input_dim=128, wordvec_dim=128,
                hidden_dim=128, max_seq_len=9)


def test_monotone_keys_total_order(rng_np):
    """The f32->int32 map preserves float comparison order exactly,
    including across signs and at the +/-0.0 boundary."""
    vals = np.concatenate([
        rng_np.standard_normal(100).astype(np.float32) * 10,
        # (no subnormals: the +0.0 canonicalization flushes them to
        # zero under XLA's FTZ arithmetic — see monotone_keys' docstring)
        np.float32([0.0, -0.0, 1e-37, -1e-37, 1e30, -1e30, 3.5, -3.5]),
    ])
    keys = np.asarray(monotone_keys(jnp.asarray(vals)))
    order = np.argsort(vals, kind="stable")
    sorted_keys = keys[order]
    assert (np.diff(sorted_keys) >= 0).all()
    # strict where the floats are strictly ordered (-0.0 == +0.0 so
    # their keys must tie)
    sv = vals[order]
    strict = sv[1:] > sv[:-1]
    assert (np.diff(sorted_keys)[strict] > 0).all()
    assert keys[list(vals).index(0.0)] == np.asarray(
        monotone_keys(jnp.float32(-0.0)))


def test_keyspace_threshold_is_kth_value(rng_np):
    """With unit weights and budget k, the returned key thresholds the
    exact top-k keep set of lax.top_k — duplicates at the k-th value
    all survive."""
    logits = rng_np.standard_normal((6, 32)).astype(np.float32)
    logits[0, :5] = 2.5              # ties above and AT the kth value
    logits[1, 3] = -0.0              # +/-0.0 straddling the threshold
    logits[1, 7] = 0.0
    logits[2] = 1.0                  # fully tied row
    lj = jnp.asarray(logits)
    for k in (1, 3, 5, 31):
        keys = monotone_keys(lj)
        thr = keyspace_threshold(keys, jnp.ones_like(lj), jnp.float32(k))
        got_keep = np.asarray(keys >= thr)
        kth = jax.lax.top_k(lj, k)[0][:, -1:]
        ref_keep = np.asarray(lj >= kth)
        np.testing.assert_array_equal(got_keep, ref_keep)


@pytest.mark.parametrize("k,p", [(3, None), (0, 0.7), (4, 0.9), (1, None),
                                 (0, 0.2), (30, 0.999), (0, 1.0)])
def test_filter_keep_set_matches_filter_logits(rng_np, k, p):
    """The sort-free kernel filter keeps exactly filter_logits' token
    set for every (top-k, nucleus) combination, tie cases included."""
    logits = rng_np.standard_normal((8, 32)).astype(np.float32)
    logits[0, :4] = 2.5
    logits[1, 3] = -0.0
    logits[1, 7] = 0.0
    lj = jnp.asarray(logits)
    ref = np.asarray(filter_logits(
        lj, top_k=k, top_p=jnp.float32(p) if p is not None else None))
    got = np.asarray(filter_scaled_logits(
        lj, jnp.int32(k), jnp.float32(p if p is not None else 1.0),
        use_top_k=k > 0, use_top_p=p is not None))
    np.testing.assert_array_equal(np.isfinite(ref), got > -1e29)
    # surviving logits pass through unchanged
    keep = np.isfinite(ref)
    np.testing.assert_array_equal(ref[keep], got[keep])


@pytest.mark.parametrize("seed,shape", [(0, (13, 200)), (7, (5, 7)),
                                        (123, (128, 1024)), (9, (640, 41))])
def test_inkernel_gumbel_is_bitexact(seed, shape):
    """The kernel's per-element threefry+Gumbel recomputation IS
    jax.random.gumbel under partitionable threefry: same 20-round hash
    of counter (0, flat_idx), same bits->uniform->double-log map, bit
    for bit (odd shapes included — the partitionable path has no
    pairing/padding step)."""
    assert jax.config.jax_threefry_partitionable  # the jax>=0.4.30 default
    key = jax.random.PRNGKey(seed)
    kd = jax.lax.bitcast_convert_type(key, jnp.int32)
    idx = jnp.arange(int(np.prod(shape)), dtype=jnp.int32).reshape(shape)
    got = np.asarray(gumbel_from_bits(threefry2x32_bits(kd[0], kd[1], idx)))
    ref = np.asarray(jax.random.gumbel(key, shape, jnp.float32))
    np.testing.assert_array_equal(got.view(np.int32), ref.view(np.int32))


def test_fused_rows_ok_counter_space():
    """The fused-path guard tracks the int32 counter space on the
    PADDED batch: row*vocab+col must stay below 2**31."""
    assert fused_rows_ok(8192, 1004)          # round 4's cap, now fine
    assert fused_rows_ok(2_000_000, 1004)
    assert not fused_rows_ok(2_200_000, 1004)  # 2.2M*1004 > 2**31
    assert not fused_rows_ok(2**31 // 40, 40)  # padding pushes it over
    with pytest.raises(ValueError, match="counter space"):
        # the wrapper re-checks at trace time — eval_shape triggers the
        # guard without allocating the (huge) feature batch
        pp = policy.init(jax.random.PRNGKey(0), CFG)
        rows = 2**31 // CFG.vocab_size + 128
        jax.eval_shape(
            lambda f, s: fused_sample_decode(
                pp, f, s, jax.random.PRNGKey(0), interpret=True),
            jax.ShapeDtypeStruct((rows, CFG.input_dim), jnp.float32),
            jax.ShapeDtypeStruct((rows,), jnp.int32))


def test_sample_step_keys_match_scan_schedule():
    """The outside-generated key schedule is the one sample_decode's
    scan draws (carry key; split per step)."""
    rng = jax.random.PRNGKey(7)
    subs = np.asarray(sample_step_keys(rng, 4))
    key = rng
    for t in range(4):
        key, sub = jax.random.split(key)
        np.testing.assert_array_equal(subs[t], np.asarray(sub))


@pytest.mark.parametrize("kw", [
    dict(temperature=1.0),
    dict(temperature=1.5, top_k=4),
    dict(temperature=0.8, top_p=jnp.float32(0.9)),
    dict(temperature=2.0, top_k=6, top_p=jnp.float32(0.95)),
])
def test_fused_sample_matches_xla_scan(rng_np, kw):
    """Interpret-mode token-for-token parity with sample_decode at equal
    keys across all filter variants (multi-tile: block_n < n)."""
    params = policy.init(jax.random.PRNGKey(0), CFG)
    feats = jnp.asarray(rand_features(rng_np, 13, CFG.input_dim))
    start = jnp.ones(13, jnp.int32)
    key = jax.random.PRNGKey(42)
    ref = sample_decode(params, CFG, feats, start, key,
                        max_len=CFG.max_seq_len, **kw)
    got = fused_sample_decode(
        params, feats, start, key, max_len=CFG.max_seq_len,
        block_n=8, weight_dtype=jnp.float32, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_sample_rejects_bidirectional():
    cfg = NetConfig(vocab_size=50, input_dim=16, wordvec_dim=16,
                    hidden_dim=16, bidirectional=True)
    params = policy.init(jax.random.PRNGKey(2), cfg)
    with pytest.raises(ValueError, match="unidirectional"):
        fused_sample_decode(params, jnp.zeros((4, 16)),
                            jnp.ones(4, jnp.int32), jax.random.PRNGKey(0),
                            interpret=True)


def _small_captioner(**kw):
    from image_captioning_through_rl_tpu.api import Captioner

    cfg = NetConfig(vocab_size=40, input_dim=12, wordvec_dim=14,
                    hidden_dim=16, max_seq_len=7, **kw)
    pp = policy.init(jax.random.PRNGKey(0), cfg)
    idx = {i: f"w{i}" for i in range(cfg.vocab_size)}
    return Captioner(pp, cfg, idx), cfg


def test_api_dispatch_latches_xla_without_mosaic(rng_np):
    """On CPU (no Mosaic backend) the sampling canary fails over to the
    XLA path, latches it, and still returns the XLA-exact tokens."""
    cap, cfg = _small_captioner()
    feats = rand_features(rng_np, 6, cfg.input_dim)
    got = cap.sample_tokens(feats, temperature=1.3, top_k=5, seed=9)
    want = cap.sample_tokens(feats, temperature=1.3, top_k=5, seed=9,
                             use_fused_kernel=False)
    np.testing.assert_array_equal(got, want)
    disp = cap._fused_verdict[("sample", 5, False, 1)]
    assert disp.verdict is False


def test_api_dispatch_serves_fused_when_kernel_agrees(rng_np, monkeypatch):
    """With a working kernel (interpret stand-in) the canary locks the
    fused path in: the XLA jit runs once, fused serves later calls."""
    import image_captioning_through_rl_tpu.ops.pallas_sample as ps

    calls = {"fused": 0}
    real = ps.fused_sample_decode

    def interp(params, f, s, key, **kw):
        calls["fused"] += 1
        kw.pop("interpret", None)
        return real(params, f, s, key, weight_dtype=jnp.float32,
                    interpret=True, **kw)

    monkeypatch.setattr(ps, "fused_sample_decode", interp)
    cap, cfg = _small_captioner()
    feats = rand_features(rng_np, 5, cfg.input_dim)
    a = cap.sample_tokens(feats, temperature=0.9, top_p=0.85, seed=3,
                          num_samples=2)
    disp = cap._fused_verdict[("sample", 0, True, 2)]
    assert disp.verdict is True and calls["fused"] == 1
    b = cap.sample_tokens(feats, temperature=0.9, top_p=0.85, seed=3,
                          num_samples=2)
    assert calls["fused"] == 2  # fused now serves directly
    np.testing.assert_array_equal(a, b)
    # and it matches the pure-XLA result exactly
    want = np.asarray(sample_decode_n(
        cap._policy, cfg, jnp.asarray(feats, jnp.float32),
        jnp.ones(5, jnp.int32), jax.random.PRNGKey(3), 2,
        temperature=jnp.float32(0.9), top_p=jnp.float32(0.85)))
    np.testing.assert_array_equal(a, want)


def test_api_fused_dispatch_survives_batch_size_change(rng_np, monkeypatch):
    """The latched fused closure must shape its output from EACH call's
    batch, not the canary call's: VerifiedDispatch replays the first
    call's closure for every later batch size (regression — an 8-row
    canary followed by a 16-row request once returned (8, 2, 2T))."""
    import image_captioning_through_rl_tpu.ops.pallas_sample as ps

    real = ps.fused_sample_decode

    def interp(params, f, s, key, **kw):
        kw.pop("interpret", None)
        return real(params, f, s, key, weight_dtype=jnp.float32,
                    interpret=True, **kw)

    monkeypatch.setattr(ps, "fused_sample_decode", interp)
    cap, cfg = _small_captioner()
    small = rand_features(rng_np, 8, cfg.input_dim)
    big = rand_features(rng_np, 16, cfg.input_dim)
    a = cap.sample_tokens(small, temperature=0.9, top_k=5, seed=3,
                          num_samples=2)
    assert cap._fused_verdict[("sample", 5, False, 2)].verdict is True
    assert a.shape == (8, 2, cfg.max_seq_len)
    b = cap.sample_tokens(big, temperature=0.9, top_k=5, seed=3,
                          num_samples=2)
    assert b.shape == (16, 2, cfg.max_seq_len)
    want = np.asarray(sample_decode_n(
        cap._policy, cfg, jnp.asarray(big, jnp.float32),
        jnp.ones(16, jnp.int32), jax.random.PRNGKey(3), 2,
        temperature=jnp.float32(0.9), top_k=5))
    np.testing.assert_array_equal(b, want)


def test_api_plain_sampling_skips_dispatch(rng_np):
    """Unfiltered sampling never consults the fused dispatch — the
    measured policy (MEASURED.md): plain sampling is faster on the XLA
    scan, so no canary is spent on it."""
    cap, cfg = _small_captioner()
    feats = rand_features(rng_np, 4, cfg.input_dim)
    cap.sample_tokens(feats, temperature=1.1, seed=2)
    assert not any(k[0] == "sample" for k in cap._fused_verdict)
    # top_k >= vocab disables the k filter (filter_logits semantics)
    cap.sample_tokens(feats, temperature=1.1, top_k=cfg.vocab_size, seed=2)
    assert not any(k[0] == "sample" for k in cap._fused_verdict)


def test_api_force_fused_raises_oversized_and_bidirectional(rng_np):
    cap, cfg = _small_captioner()
    feats = rand_features(rng_np, 4, cfg.input_dim)
    with pytest.raises(ValueError, match="caps the row count"):
        # 4 * 2**27 rows x 40 vocab blows the int32 counter space; the
        # guard fires before any tiling/allocation happens
        cap.sample_tokens(feats, use_fused_kernel=True,
                          num_samples=2**27)
    bicap, bicfg = _small_captioner(bidirectional=True)
    bifeats = rand_features(rng_np, 4, bicfg.input_dim)
    with pytest.raises(ValueError, match="cannot be honored"):
        bicap.sample_tokens(bifeats, use_fused_kernel=True)

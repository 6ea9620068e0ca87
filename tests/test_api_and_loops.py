"""High-level API + trainer-driver semantics (Q12 checkpoint cadence)."""

import pytest
import os

import numpy as np

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.api import Captioner, evaluate_captions
from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
from image_captioning_through_rl_tpu.models import a2c, policy
from image_captioning_through_rl_tpu.train import checkpoint as ckpt
from image_captioning_through_rl_tpu.train.loops import train_policy_network

from torch_oracles import rand_features

CFG = NetConfig(vocab_size=31, input_dim=12, wordvec_dim=14, hidden_dim=16, max_seq_len=8)


def test_captioner_greedy_and_beam(rng_np):
    params = a2c.init(jax.random.PRNGKey(0), CFG)
    idx_to_word = {i: (["<NULL>", "<START>", "<END>", "<UNK>"] + [f"w{j}" for j in range(27)])[i]
                   for i in range(31)}
    cap = Captioner(params, CFG, idx_to_word)
    feats = rand_features(rng_np, 4, CFG.input_dim)
    greedy = cap.caption(feats)
    assert len(greedy) == 4 and all(isinstance(s, str) for s in greedy)
    beam = cap.caption(feats, beam_size=3)
    assert len(beam) == 4
    toks = cap.caption_tokens(feats)
    assert toks.shape == (4, CFG.max_seq_len)
    assert np.all(toks[:, 0] == 1)


def test_captioner_verified_dispatch_agrees_with_xla(rng_np):
    """Auto mode (use_fused_kernel=None) must return the XLA path's
    tokens whether the fused kernel is available or not: on CPU the
    canary fails to compile and locks in XLA; on TPU agreement is
    required before the kernel serves. Either way the first-call result
    equals the forced-XLA result, and the verdict is cached."""
    params = a2c.init(jax.random.PRNGKey(2), CFG)
    idx_to_word = {i: f"w{i}" for i in range(31)}
    cap = Captioner(params, CFG, idx_to_word)
    feats = rand_features(rng_np, 5, CFG.input_dim)

    auto_g = cap.caption_tokens(feats)
    xla_g = cap.caption_tokens(feats, use_fused_kernel=False)
    np.testing.assert_array_equal(auto_g, xla_g)
    assert ("greedy",) in cap._fused_verdict

    auto_b = cap.caption_tokens(feats, beam_size=3)
    xla_b = cap.caption_tokens(feats, beam_size=3, use_fused_kernel=False)
    np.testing.assert_array_equal(auto_b, xla_b)
    assert ("beam", 3) in cap._fused_verdict
    # cached verdict: second auto call takes the same branch
    np.testing.assert_array_equal(cap.caption_tokens(feats, beam_size=3), xla_b)


def test_captioner_policy_only_rejects_beam(rng_np):
    pparams = policy.init(jax.random.PRNGKey(1), CFG)
    cap = Captioner(pparams, CFG, {i: "w" for i in range(31)})
    feats = rand_features(rng_np, 2, CFG.input_dim)
    try:
        cap.caption(feats, beam_size=3)
        assert False
    except ValueError:
        pass


def test_evaluate_captions_keys():
    s = evaluate_captions(["a man rides a horse"], ["a man rides a horse"])
    assert s["Bleu_1"] > 0.99
    assert set(s) >= {"Bleu_4", "ROUGE_L", "CIDEr", "METEOR"}


def test_best_loss_checkpoint_saves_pre_update_weights(tmp_path, monkeypatch):
    """Q12: the saved checkpoint holds the weights ENTERING the best
    minibatch, i.e. loading it and re-running that minibatch reproduces
    the best loss exactly."""
    coco = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=8,
                               num_val_images=4, vocab_size=30, feature_dim=16, seed=5)
    data = load_data(coco)

    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig as NC

    monkeypatch.setattr(
        loops, "_cfg_for",
        lambda d, b, nd=None: NC.for_vocab(d.word_to_idx, d.embeddings, bidirectional=b,
                                  input_dim=16, wordvec_dim=8, hidden_dim=8),
    )
    paths = {"policy_network": str(tmp_path / "policyNetwork.ckpt")}
    params = train_policy_network(data, paths, None, False, epochs=2, batch_size=8, seed=3)
    assert os.path.exists(paths["policy_network"])
    # saved params differ from final params (pre-update of best minibatch)
    saved = ckpt.load_pytree(params, paths["policy_network"])
    diff = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(params))
    )
    assert diff


@pytest.mark.slow
def test_captioner_faithful_beam_uses_q1_stateful_path(rng_np):
    """API faithful_beam must produce the CLI --faithful_beam tokens:
    the Q2 batch-mean beam WITH the Q1-stateful value stream
    (decode.beam_compat), not the clean-encoder batch-mean beam."""
    import jax

    from image_captioning_through_rl_tpu.api import Captioner
    from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig
    from image_captioning_through_rl_tpu.decode.beam_compat import beam_search_compat
    from image_captioning_through_rl_tpu.models import a2c

    cfg = NetConfig(vocab_size=24, input_dim=8, wordvec_dim=10, hidden_dim=12,
                    max_seq_len=7)
    params = a2c.init(jax.random.PRNGKey(3), cfg)
    feats = jnp.asarray(rng_np.standard_normal((5, 8)).astype(np.float32))
    idx_to_word = {i: f"w{i}" for i in range(24)}

    cap = Captioner(params, cfg, idx_to_word)
    got = cap.caption_tokens(feats, beam_size=3, faithful_beam=True,
                             use_fused_kernel=False)
    dcfg = DecodeConfig(beam_size=3, max_seq_len=cfg.max_seq_len,
                        per_sample_beams=False)
    want, _, _ = beam_search_compat(
        params["policy"], params["value"], cfg, dcfg, feats,
        jnp.ones((5,), jnp.int32),
    )
    np.testing.assert_array_equal(got, np.asarray(want[:, 0]))


def test_captioner_forced_fused_kernel_raises_when_unfusable(rng_np):
    """use_fused_kernel=True must raise, not silently serve XLA, when
    the config cannot run the fused kernels."""
    import jax
    import pytest

    from image_captioning_through_rl_tpu.api import Captioner
    from image_captioning_through_rl_tpu.config import NetConfig
    from image_captioning_through_rl_tpu.models import a2c

    cfg = NetConfig(vocab_size=24, input_dim=8, wordvec_dim=10, hidden_dim=12,
                    max_seq_len=7, bidirectional=True)
    params = a2c.init(jax.random.PRNGKey(3), cfg)
    feats = jnp.asarray(rng_np.standard_normal((4, 8)).astype(np.float32))
    cap = Captioner(params, cfg, {i: f"w{i}" for i in range(24)})
    with pytest.raises(ValueError, match="cannot be honored"):
        cap.caption_tokens(feats, use_fused_kernel=True)
    with pytest.raises(ValueError, match="cannot be honored"):
        cap.caption_tokens(feats, beam_size=3, use_fused_kernel=True)


def test_captioner_mesh_serving_matches_single_device(rng_np):
    """Captioner(mesh=...) serves batch-sharded over the 8-device mesh,
    token-equal to the single-device Captioner (greedy and beam)."""
    from image_captioning_through_rl_tpu.api import Captioner
    from image_captioning_through_rl_tpu.models import a2c
    from image_captioning_through_rl_tpu.parallel import make_mesh

    params = a2c.init(jax.random.PRNGKey(6), CFG)
    idx_to_word = {i: f"w{i}" for i in range(CFG.vocab_size)}
    feats = rand_features(rng_np, 13, CFG.input_dim)  # not a multiple of 8

    plain = Captioner(params, CFG, idx_to_word)
    meshy = Captioner(params, CFG, idx_to_word, mesh=make_mesh((8,), ("data",)))

    np.testing.assert_array_equal(
        meshy.caption_tokens(feats), plain.caption_tokens(feats, use_fused_kernel=False))
    np.testing.assert_array_equal(
        meshy.caption_tokens(feats, beam_size=3),
        plain.caption_tokens(feats, beam_size=3, use_fused_kernel=False))


@pytest.mark.slow
def test_captioner_mesh_serves_bidirectional_sharded(rng_np):
    """A mesh-holding Captioner with a BIDIRECTIONAL model must shard
    too (full-prefix decode family) — token-equal to the single-device
    Captioner for greedy, beam, and sampling at equal seeds. Closes the
    silent-single-device gap the sampling path used to have."""
    from image_captioning_through_rl_tpu.api import Captioner
    from image_captioning_through_rl_tpu.models import a2c
    from image_captioning_through_rl_tpu.parallel import make_mesh

    cfg = NetConfig(vocab_size=24, input_dim=8, wordvec_dim=10, hidden_dim=12,
                    max_seq_len=6, bidirectional=True)
    params = a2c.init(jax.random.PRNGKey(7), cfg)
    idx_to_word = {i: f"w{i}" for i in range(cfg.vocab_size)}
    feats = rand_features(rng_np, 13, cfg.input_dim)  # not a multiple of 8

    plain = Captioner(params, cfg, idx_to_word)
    meshy = Captioner(params, cfg, idx_to_word, mesh=make_mesh((8,), ("data",)))

    np.testing.assert_array_equal(
        meshy.caption_tokens(feats), plain.caption_tokens(feats))
    np.testing.assert_array_equal(
        meshy.caption_tokens(feats, beam_size=3),
        plain.caption_tokens(feats, beam_size=3))
    np.testing.assert_array_equal(
        meshy.sample_tokens(feats, temperature=1.1, top_k=5, seed=3),
        plain.sample_tokens(feats, temperature=1.1, top_k=5, seed=3))
    # forcing the single-chip fused kernel on a mesh still errors
    with pytest.raises(ValueError, match="mesh"):
        meshy.caption_tokens(feats, use_fused_kernel=True)


def test_forced_fused_flags_error_on_incompatible_modes(tmp_path):
    """Explicitly forced fused kernels must ERROR on compat/bidi/mesh
    instead of silently serving a different program (the serving path's
    use_fused_kernel=True contract, review round 4)."""
    import pytest

    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.models import a2c, reward
    from image_captioning_through_rl_tpu.parallel import make_mesh
    from image_captioning_through_rl_tpu.train import loops
    from image_captioning_through_rl_tpu.train.optim import adam

    cfg = NetConfig(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8)
    fixture = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=4,
                                  num_val_images=2, vocab_size=30,
                                  feature_dim=16, seed=1)
    data = load_data(fixture)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    rparams = reward.init(jax.random.PRNGKey(1), cfg)
    tx = adam(1e-4, params, cfg.freeze_embeddings)
    with pytest.raises(ValueError, match="cannot be honored"):
        loops.a2c_training(
            data, params, rparams, tx, tx.init(params), cfg, None,
            [str(tmp_path / "m.ckpt")], batch_size=8, epochs=1,
            fused_rollout=True, mesh=make_mesh((8,), ("data",)),
        )
    with pytest.raises(ValueError, match="cannot be honored"):
        loops.train_policy_network(
            data, {"policy_network": str(tmp_path / "p.ckpt")}, None, False,
            epochs=1, batch_size=8, fused_chain=True,
            mesh=make_mesh((8,), ("data",)),
        )


def test_cfg_for_net_dims_override_and_embedding_precedence():
    """--input_dim/--wordvec_dim/--hidden_dim surface the reference's
    hard-coded architecture constants (models.py:17-18) as config; a
    pretrained embedding table fixes wordvec_dim (models.py:61-65), so
    that one override is dropped when vectors ship with the data."""
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.data.coco import CocoData

    w2i = {f"w{i}": i for i in range(10)}
    base = dict(word_to_idx=w2i, idx_to_word={v: k for k, v in w2i.items()},
                train_features=np.zeros((2, 64), np.float32),
                train_captions=np.zeros((2, 17), np.int32),
                train_captions_lens=np.full(2, 3, np.int32),
                val_captions_lens=np.full(2, 3, np.int32),
                train_image_idxs=np.zeros(2, np.int64),
                val_features=np.zeros((2, 64), np.float32),
                val_captions=np.zeros((2, 17), np.int32),
                val_image_idxs=np.zeros(2, np.int64),
                train_urls=np.array(["u"] * 2), val_urls=np.array(["u"] * 2))
    data = CocoData(embeddings=None, **base)

    cfg = loops._cfg_for(data, False,
                         {"input_dim": 64, "wordvec_dim": 24, "hidden_dim": 48})
    assert (cfg.input_dim, cfg.wordvec_dim, cfg.hidden_dim) == (64, 24, 48)

    # with no overrides, input_dim is inferred from the dataset's
    # feature width (it must match for any forward to run); the purely
    # architectural dims keep the reference defaults
    cfg0 = loops._cfg_for(data, False, None)
    d = NetConfig(vocab_size=1)
    assert (cfg0.input_dim, cfg0.wordvec_dim, cfg0.hidden_dim) == (
        64, d.wordvec_dim, d.hidden_dim)

    # an explicit override still wins over the inferred width
    cfg1 = loops._cfg_for(data, False, {"input_dim": 512})
    assert cfg1.input_dim == 512

    # pretrained vectors win over a conflicting --wordvec_dim
    data_emb = CocoData(embeddings=np.zeros((10, 32), np.float32), **base)
    cfg2 = loops._cfg_for(data_emb, False, {"wordvec_dim": 24, "hidden_dim": 48})
    assert cfg2.wordvec_dim == 32 and cfg2.hidden_dim == 48

"""Exact resume: full train-state snapshots (train/checkpoint.py
save_train_state / loops train_state_path+resume_state).

The reference's resume is weights-only — an interrupted A2C run
restarts with fresh Adam moments, fresh RNG streams and epoch 0
(trainers.py:338-370). The snapshots here additionally carry the
optimizer state, BOTH RNG streams (the numpy batch sampler and the jax
rollout key) and the loop position, so a resumed run continues
bit-identically to the uninterrupted one.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
from image_captioning_through_rl_tpu.models import a2c, reward
from image_captioning_through_rl_tpu.train import checkpoint as ckpt
from image_captioning_through_rl_tpu.train import loops, optim

VOCAB = 30
CFG = NetConfig(vocab_size=VOCAB, input_dim=10, wordvec_dim=12,
                hidden_dim=14, max_seq_len=9)


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _fresh(seed=0):
    params = a2c.init(jax.random.PRNGKey(seed), CFG)
    rparams = reward.init(jax.random.PRNGKey(seed + 1), CFG)
    tx = optim.adam(1e-3)
    return params, rparams, tx, tx.init(params)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = make_synthetic_coco(
        str(tmp_path_factory.mktemp("coco")), num_train_images=10,
        num_val_images=4, captions_per_image=2, vocab_size=VOCAB,
        feature_dim=CFG.input_dim, seed=5)
    return load_data(d)


# ---- snapshot format round-trip ----


def test_train_state_roundtrip(tmp_path):
    params, _, tx, opt_state = _fresh()
    rng = np.random.default_rng(7)
    rng.standard_normal(100)  # advance: the state must carry position
    key = jax.random.split(jax.random.PRNGKey(3))[0]
    meta = {"kind": "a2c", "epoch_done": 4, "best": float("inf"),
            "rng_state": rng.bit_generator.state}
    path = str(tmp_path / "a2c.trainstate")
    ckpt.save_train_state(path, params, opt_state, key, meta)

    p_t, _, tx_t, o_t = _fresh(seed=9)  # different values, same structure
    got = ckpt.load_train_state(path, p_t, o_t)
    _trees_equal(got["params"], params)
    _trees_equal(got["opt_state"], opt_state)
    np.testing.assert_array_equal(np.asarray(got["key"]), np.asarray(key))
    assert got["meta"]["epoch_done"] == 4
    assert got["meta"]["best"] == float("inf")  # JSON Infinity round-trip
    # the 128-bit PCG64 state integers survive (the reason meta is JSON)
    r2 = np.random.default_rng(0)
    r2.bit_generator.state = got["meta"]["rng_state"]
    assert r2.standard_normal() == rng.standard_normal()


def test_train_state_version_gate(tmp_path, monkeypatch):
    params, _, tx, opt_state = _fresh()
    path = str(tmp_path / "a2c.trainstate")
    monkeypatch.setattr(ckpt, "_TRAIN_STATE_VERSION", 99)
    ckpt.save_train_state(path, params, opt_state, jax.random.PRNGKey(0),
                          {"kind": "a2c"})
    monkeypatch.undo()
    with pytest.raises(ValueError, match="version"):
        ckpt.load_train_state(path, params, opt_state)


def test_train_state_typed_key_roundtrip(tmp_path):
    """A typed jax PRNG key restores as a TYPED key (wrap_key_data with
    the saved impl), not bare uint32 data — jax.random.split on the
    restored key must work in the resumed loop."""
    params, _, tx, opt_state = _fresh()
    key = jax.random.split(jax.random.key(3))[0]  # typed (new-style)
    path = str(tmp_path / "a2c.trainstate")
    ckpt.save_train_state(path, params, opt_state, key,
                          {"kind": "a2c", "epoch_done": 1})
    got = ckpt.load_train_state(path, params, opt_state)
    assert jnp.issubdtype(got["key"].dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(got["key"])),
        np.asarray(jax.random.key_data(key)))
    # and the resumed stream continues identically
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(jax.random.split(got["key"]))),
        np.asarray(jax.random.key_data(jax.random.split(key))))


def test_train_state_rejects_wrong_architecture(tmp_path):
    """Resuming with different net dims raises a clear architecture
    diagnosis instead of silently restoring wrong-shaped params
    (from_state_dict copies without shape checks)."""
    params, _, tx, opt_state = _fresh()
    path = str(tmp_path / "a2c.trainstate")
    ckpt.save_train_state(path, params, opt_state, jax.random.PRNGKey(0),
                          {"kind": "a2c", "epoch_done": 1})
    big = NetConfig(vocab_size=VOCAB, input_dim=10, wordvec_dim=12,
                    hidden_dim=28, max_seq_len=9)
    p_t = a2c.init(jax.random.PRNGKey(1), big)
    o_t = tx.init(p_t)
    with pytest.raises(ValueError, match="architecture"):
        ckpt.load_train_state(path, p_t, o_t)


# ---- plain A2C: bit-identical resume ----


def _run_plain(data, tmp_path, epochs, resume=False, tag="a"):
    params, rparams, tx, opt_state = _fresh()
    state_path = str(tmp_path / f"{tag}.trainstate")
    resume_state = None
    if resume:
        resume_state = ckpt.load_train_state(state_path, params, opt_state)
    return loops.a2c_training(
        data, params, rparams, tx, opt_state, CFG, plot_dir=None,
        save_paths=[str(tmp_path / f"{tag}.ckpt")], batch_size=6,
        epochs=epochs, seed=3, chunk_steps=1,
        train_state_path=state_path, resume_state=resume_state)


@pytest.mark.slow
def test_plain_resume_bit_identical(data, tmp_path):
    full = _run_plain(data, tmp_path, epochs=3, tag="full")
    _run_plain(data, tmp_path, epochs=1, tag="split")   # "interrupted"
    resumed = _run_plain(data, tmp_path, epochs=3, resume=True, tag="split")
    _trees_equal(full, resumed)


@pytest.mark.slow
def test_plain_resume_restores_optimizer_and_rng(data, tmp_path):
    """Teeth: weights-only resume (the reference's semantics — fresh
    Adam moments + fresh RNG) must NOT reproduce the uninterrupted run,
    or the snapshot's extra state would be dead weight."""
    full = _run_plain(data, tmp_path, epochs=3, tag="f2")
    _run_plain(data, tmp_path, epochs=1, tag="s2")
    weights = ckpt.load_pytree(_fresh()[0], str(tmp_path / "s2.ckpt"))
    params, rparams, tx, _ = _fresh()
    weights_only = loops.a2c_training(
        data, weights, rparams, tx, tx.init(weights), CFG, plot_dir=None,
        save_paths=[], batch_size=6, epochs=2, seed=3, chunk_steps=1)
    diffs = sum(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(full), jax.tree.leaves(weights_only)))
    assert diffs > 0


@pytest.mark.slow
def test_plain_resume_completed_run_is_noop(data, tmp_path):
    done = _run_plain(data, tmp_path, epochs=2, tag="done")
    again = _run_plain(data, tmp_path, epochs=2, resume=True, tag="done")
    _trees_equal(done, again)


def test_plain_rejects_curriculum_state(data, tmp_path):
    params, rparams, tx, opt_state = _fresh()
    path = str(tmp_path / "x.trainstate")
    rng = np.random.default_rng(0)
    ckpt.save_train_state(path, params, opt_state, jax.random.PRNGKey(0),
                          {"kind": "a2c_curriculum", "curriculum": [3],
                           "level_idx": 0, "epoch_done": 1, "best": 1.0,
                           "rng_state": rng.bit_generator.state})
    rs = ckpt.load_train_state(path, params, opt_state)
    with pytest.raises(ValueError, match="cannot resume a plain"):
        loops.a2c_training(
            data, params, rparams, tx, opt_state, CFG, plot_dir=None,
            save_paths=[], batch_size=6, epochs=1, resume_state=rs)


# ---- curriculum: resume across and within level boundaries ----


def _run_curr(data, tmp_path, *, interrupt_after=None, resume=False,
              tag="c", levels=(3, 8), epochs=2, monkeypatch=None):
    params, rparams, tx, opt_state = _fresh()
    state_path = str(tmp_path / f"{tag}.trainstate")
    resume_state = None
    if resume:
        resume_state = ckpt.load_train_state(state_path, params, opt_state)
    if interrupt_after is not None:
        real = loops._drive_a2c_epoch
        calls = {"n": 0}

        def counting(*a, **kw):
            # raise on ENTRY to epoch interrupt_after+1: a real interrupt
            # lands mid-epoch, after the previous epoch's snapshot was
            # written and before this epoch completes (its work is lost)
            if calls["n"] >= interrupt_after:
                raise KeyboardInterrupt
            calls["n"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(loops, "_drive_a2c_epoch", counting)
    try:
        return loops.a2c_curriculum_training(
            data, params, rparams, tx, opt_state, CFG, plot_dir=None,
            save_paths=[str(tmp_path / f"{tag}.ckpt")], batch_size=6,
            epochs=epochs, curriculum=list(levels), seed=4, chunk_steps=1,
            train_state_path=state_path, resume_state=resume_state)
    except KeyboardInterrupt:
        return None


@pytest.mark.slow
@pytest.mark.parametrize("interrupt_after", [1, 2, 3])
def test_curriculum_resume_bit_identical(data, tmp_path, monkeypatch,
                                         interrupt_after):
    """Interrupt after 1 epoch (mid-level), 2 (level boundary) or 3
    (mid second level) of a [3, 8] x 2-epoch curriculum; resume must
    reproduce the uninterrupted run bitwise."""
    tag = f"c{interrupt_after}"
    full = _run_curr(data, tmp_path, tag=tag + "full")
    got = _run_curr(data, tmp_path, tag=tag, interrupt_after=interrupt_after,
                    monkeypatch=monkeypatch)
    assert got is None  # really interrupted
    monkeypatch.undo()
    resumed = _run_curr(data, tmp_path, tag=tag, resume=True)
    _trees_equal(full, resumed)


@pytest.mark.slow
def test_curriculum_rejects_mismatched_levels(data, tmp_path):
    _run_curr(data, tmp_path, tag="mm", levels=(3, 8), epochs=1)
    params, rparams, tx, opt_state = _fresh()
    rs = ckpt.load_train_state(str(tmp_path / "mm.trainstate"),
                               params, opt_state)
    with pytest.raises(ValueError, match="curriculum .* does not match"):
        loops.a2c_curriculum_training(
            data, params, rparams, tx, opt_state, CFG, plot_dir=None,
            save_paths=[], batch_size=6, epochs=1, curriculum=[4, 8],
            resume_state=rs)


# ---- orchestrator: --resume prefers the full snapshot ----


@pytest.mark.slow
def test_train_a2c_network_resume_roundtrip(data, tmp_path, capsys,
                                            monkeypatch):
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    paths = {k: str(tmp_path / f"{k}.ckpt")
             for k in ("reward_network", "policy_network", "value_network",
                       "a2c_network")}
    save_paths = {"model_path": str(tmp_path / "model.ckpt"),
                  "results_path": str(tmp_path / "results.txt")}
    kw = dict(plot_dir=None, bidirectional=False, batch_size=6,
              retrain_all=False, seed=0, chunk_steps=1)
    # first run trains subnets (tiny: 1 epoch default comes from config;
    # force short pretraining by pre-seeding the subnet checkpoints)
    for kind, key in (("reward", "reward_network"),
                      ("policy", "policy_network"),
                      ("value", "value_network")):
        from image_captioning_through_rl_tpu.models import (policy as pol,
                                                            value as val)
        mod = {"reward": reward, "policy": pol, "value": val}[kind]
        ckpt.save_pytree(mod.init(jax.random.PRNGKey(1), CFG,
                                  data.embeddings), paths[key])

    full = loops.train_a2c_network(data, save_paths, paths, epochs=3, **kw)
    state_file = paths["a2c_network"] + ".trainstate"
    assert os.path.exists(state_file)

    # wipe and redo as 1 epoch + resume to 3
    os.remove(state_file)
    loops.train_a2c_network(data, save_paths, paths, epochs=1, **kw)
    resumed = loops.train_a2c_network(data, save_paths, paths, epochs=3,
                                      resume=True, **kw)
    out = capsys.readouterr().out
    assert "resumed full A2C train state (epoch 1 done)" in out
    _trees_equal(full, resumed)


@pytest.mark.slow
def test_train_a2c_network_weights_only_fallback(data, tmp_path, capsys,
                                                 monkeypatch):
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    paths = {k: str(tmp_path / f"{k}.ckpt")
             for k in ("reward_network", "policy_network", "value_network",
                       "a2c_network")}
    save_paths = {"model_path": str(tmp_path / "model.ckpt"),
                  "results_path": str(tmp_path / "results.txt")}
    from image_captioning_through_rl_tpu.models import policy as pol
    from image_captioning_through_rl_tpu.models import value as val
    for kind, key in (("reward", "reward_network"),
                      ("policy", "policy_network"),
                      ("value", "value_network")):
        mod = {"reward": reward, "policy": pol, "value": val}[kind]
        ckpt.save_pytree(mod.init(jax.random.PRNGKey(1), CFG,
                                  data.embeddings), paths[key])
    kw = dict(plot_dir=None, bidirectional=False, batch_size=6,
              retrain_all=False, seed=0, chunk_steps=1)
    loops.train_a2c_network(data, save_paths, paths, epochs=1, **kw)
    os.remove(paths["a2c_network"] + ".trainstate")  # pre-snapshot ckpt
    loops.train_a2c_network(data, save_paths, paths, epochs=1, resume=True,
                            **kw)
    assert "resumed A2C weights from checkpoint" in capsys.readouterr().out


# ---- pretrainers: bit-identical resume through the shared driver ----


def _run_policy(data, tmp_path, epochs, resume=False, tag="p"):
    paths = {"policy_network": str(tmp_path / f"{tag}.ckpt")}
    return loops.train_policy_network(
        data, paths, None, False, epochs=epochs, batch_size=6, seed=2,
        chunk_steps=1, resume=resume)


@pytest.mark.slow
def test_policy_pretrainer_resume_bit_identical(data, tmp_path, monkeypatch):
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    full = _run_policy(data, tmp_path, epochs=3, tag="pfull")
    _run_policy(data, tmp_path, epochs=1, tag="psplit")
    resumed = _run_policy(data, tmp_path, epochs=3, resume=True, tag="psplit")
    _trees_equal(full, resumed)


@pytest.mark.slow
def test_policy_pretrainer_chunked_resume(data, tmp_path, monkeypatch):
    """Same through the chunked-dispatch path (the default)."""
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)

    def run(epochs, resume=False, tag="pc"):
        paths = {"policy_network": str(tmp_path / f"{tag}.ckpt")}
        return loops.train_policy_network(
            data, paths, None, False, epochs=epochs, batch_size=6, seed=2,
            chunk_steps=2, resume=resume)

    full = run(3, tag="pcfull")
    run(1, tag="pcsplit")
    resumed = run(3, resume=True, tag="pcsplit")
    _trees_equal(full, resumed)


@pytest.mark.slow
def test_value_pretrainer_resume_restores_py_rng(data, tmp_path, monkeypatch):
    """The value trainer's stdlib prefix-length stream rides in the
    snapshot's extra slot; resume must continue it mid-stream."""
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    from image_captioning_through_rl_tpu.models import policy as pol

    def paths_for(tag):
        p = {"reward_network": str(tmp_path / "r.ckpt"),
             "policy_network": str(tmp_path / "pp.ckpt"),
             "value_network": str(tmp_path / f"{tag}.ckpt")}
        return p

    ckpt.save_pytree(reward.init(jax.random.PRNGKey(1), CFG),
                     str(tmp_path / "r.ckpt"))
    ckpt.save_pytree(pol.init(jax.random.PRNGKey(2), CFG),
                     str(tmp_path / "pp.ckpt"))

    def run(epochs, resume=False, tag="v"):
        return loops.train_value_network(
            data, paths_for(tag), None, False, epochs=epochs, batch_size=6,
            seed=2, chunk_steps=1, resume=resume)

    full = run(3, tag="vfull")
    run(1, tag="vsplit")
    resumed = run(3, resume=True, tag="vsplit")
    _trees_equal(full, resumed)


@pytest.mark.slow
def test_pretrainer_resume_without_snapshot_is_fresh(data, tmp_path,
                                                     monkeypatch):
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    a = _run_policy(data, tmp_path, epochs=1, tag="nf")
    os.remove(str(tmp_path / "nf.ckpt.trainstate"))
    b = _run_policy(data, tmp_path, epochs=1, resume=True, tag="nf2")
    _trees_equal(a, b)  # no snapshot -> identical fresh start


def test_pretrainer_rejects_wrong_tag(data, tmp_path, monkeypatch):
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    _run_policy(data, tmp_path, epochs=1, tag="wt")
    os.rename(str(tmp_path / "wt.ckpt.trainstate"),
              str(tmp_path / "wt2.ckpt.trainstate"))
    paths = {"reward_network": str(tmp_path / "wt2.ckpt")}
    import shutil
    shutil.copy(str(tmp_path / "wt.ckpt"), str(tmp_path / "wt2.ckpt"))
    with pytest.raises(ValueError, match="not 'Reward Network-loss'"):
        loops.train_reward_network(
            data, paths, None, False, epochs=1, batch_size=6, seed=2,
            chunk_steps=1, resume=True)


# ---- kernel-choice pinning + completed-run early exit ----


def test_snapshot_records_kernel_choice(data, tmp_path, monkeypatch):
    """Per-epoch snapshots carry the probed fused-kernel verdict so a
    resume can pin it (the probe is weight-dependent — re-probing on
    trained weights could flip compilers mid-run)."""
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    _run_policy(data, tmp_path, epochs=1, tag="kc")
    params, _, tx, opt_state = _fresh()
    # raw read via the public loader (CPU runs record fused=False)
    got = ckpt.load_train_state(
        str(tmp_path / "kc.ckpt.trainstate"),
        loops.policy_mod.init(jax.random.PRNGKey(0), CFG),
        tx.init(loops.policy_mod.init(jax.random.PRNGKey(0), CFG)))
    assert got["meta"]["fused"] is False


@pytest.mark.slow
def test_resume_pins_recorded_xla_choice(data, tmp_path, monkeypatch):
    """A snapshot recording fused=False must pin the XLA step on resume
    WITHOUT re-probing — a probe that suddenly verifies on the trained
    weights would otherwise flip the continuation to differently-rounded
    Pallas updates."""
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    _run_policy(data, tmp_path, epochs=1, tag="pin")

    def probe_must_not_run(*a, **k):
        raise AssertionError("resume must not re-probe a recorded choice")

    monkeypatch.setattr(loops, "_probe_fused_policy", probe_must_not_run)
    resumed = _run_policy(data, tmp_path, epochs=2, resume=True, tag="pin")
    assert resumed is not None  # completed through the pinned XLA path


@pytest.mark.slow
def test_resume_warns_when_recorded_fused_stops_verifying(
        data, tmp_path, monkeypatch, capsys):
    """fused=True recorded but the kernels no longer verify here: the
    resume continues on XLA and says loudly that bit-identity is gone."""
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    _run_policy(data, tmp_path, epochs=1, tag="fw")
    path = str(tmp_path / "fw.ckpt.trainstate")
    tmpl = loops.policy_mod.init(jax.random.PRNGKey(0), CFG)
    tx = optim.adam(1e-3)
    got = ckpt.load_train_state(path, tmpl, tx.init(tmpl))
    # rewrite the snapshot as if the original run had verified Pallas
    ckpt.save_train_state(path, got["params"], got["opt_state"], got["key"],
                          dict(got["meta"], fused=True))
    monkeypatch.setattr(loops, "_probe_fused_policy", lambda *a, **k: False)
    capsys.readouterr()
    _run_policy(data, tmp_path, epochs=2, resume=True, tag="fw")
    out = capsys.readouterr().out
    assert "NOT bit-identical" in out


@pytest.mark.slow
def test_completed_pretrainer_resume_skips_probe_and_loop(
        data, tmp_path, monkeypatch, capsys):
    """Resuming a trainer whose snapshot already covers the requested
    epochs returns the restored weights immediately — no kernel probe,
    no step compilation (the --resume-after-A2C-crash startup path pays
    this three times otherwise)."""
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    done = _run_policy(data, tmp_path, epochs=2, tag="cp")

    def probe_must_not_run(*a, **k):
        raise AssertionError("completed trainer must not probe")

    monkeypatch.setattr(loops, "_probe_fused_policy", probe_must_not_run)
    monkeypatch.setattr(loops.steps, "make_policy_step", probe_must_not_run)
    capsys.readouterr()
    again = _run_policy(data, tmp_path, epochs=2, resume=True, tag="cp")
    assert "nothing to resume" in capsys.readouterr().out
    _trees_equal(done, again)


@pytest.mark.slow
def test_completed_a2c_resume_skips_probe(data, tmp_path, monkeypatch,
                                          capsys):
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: CFG)
    params, rparams, tx, opt_state = _fresh()
    path = str(tmp_path / "a2cdone.trainstate")

    def run(epochs, resume_state=None):
        return loops.a2c_training(
            data, params, rparams, tx, opt_state, CFG, None,
            [str(tmp_path / "m.ckpt")],
            batch_size=6, epochs=epochs, seed=3, chunk_steps=1,
            train_state_path=path, resume_state=resume_state)

    run(2)
    rs = ckpt.load_train_state(path, params, opt_state)
    monkeypatch.setattr(
        loops, "_probe_fused_rollout",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("no probe")))
    capsys.readouterr()
    out_params = run(2, resume_state=rs)
    assert "nothing to resume" in capsys.readouterr().out
    _trees_equal(out_params, rs["params"])

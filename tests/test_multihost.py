"""Multi-HOST execution proof: a genuine 2-process ``jax.distributed``
job on CPU (localhost coordinator, 4 virtual devices per process, gloo
collectives) runs the same jitted SPMD programs as a single process and
produces the same numbers.

This is the missing evidence named by the round-2 review: the launch
hook (``parallel.mesh.maybe_init_distributed``) actually brings up a
2-process runtime; ``GlobalBatcher`` builds global arrays from
per-process shards (``jax.make_array_from_process_local_data``); the
trainer loops run over the global mesh with ``is_main_process`` gating
the checkpoint writes; and both the bare step and the full
``train_policy_network`` loop match the single-process run.

The single-process leg reuses the suite's 8-virtual-device CPU mesh, so
the equivalence is 2x4 devices across processes vs 8 devices in one.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import policy
from image_captioning_through_rl_tpu.parallel import GlobalBatcher, make_mesh
from image_captioning_through_rl_tpu.train import optim, steps

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """The exact Part-1 computation of multihost_worker.py, run inside
    this (single-process, 8-device) suite."""
    cfg = NetConfig(vocab_size=32, input_dim=8, wordvec_dim=8, hidden_dim=8,
                    max_seq_len=9)
    rng = np.random.default_rng(1234)
    n = 16
    feats = rng.standard_normal((n, cfg.input_dim)).astype(np.float32)
    caps = rng.integers(3, cfg.vocab_size, size=(n, cfg.max_seq_len)).astype(np.int32)
    caps[:, 0] = 1
    caps[:, -1] = 2
    params = policy.init(jax.random.PRNGKey(0), cfg)
    tx = optim.adam(1e-3)
    opt = tx.init(params)
    step = steps.make_policy_step(cfg, tx)
    losses = []
    for _ in range(3):
        params, opt, loss = step(params, opt, jnp.asarray(feats), jnp.asarray(caps))
        losses.append(float(loss))
    return losses


def _single_process_trainer(tmp_path, monkeypatch):
    """The exact Part-2 trainer run of multihost_worker.py, single-process
    (plain path: no mesh, default device tables + chunked dispatch)."""
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco

    monkeypatch.setattr(
        loops, "_cfg_for",
        lambda d, b, nd=None: NC.for_vocab(d.word_to_idx, d.embeddings, bidirectional=b,
                                  input_dim=16, wordvec_dim=8, hidden_dim=8),
    )
    fixture = make_synthetic_coco(str(tmp_path / "coco_ref"), num_train_images=8,
                                  num_val_images=4, vocab_size=30, feature_dim=16,
                                  seed=5)
    data = load_data(fixture)
    paths = {"policy_network": str(tmp_path / "ref_policyNetwork.ckpt")}
    params = loops.train_policy_network(
        data, paths, None, False, epochs=1, batch_size=8, seed=3, chunk_steps=2,
    )
    return [float(np.asarray(x, np.float64).sum())
            for x in jax.tree.leaves(jax.device_get(params))]


def _single_process_a2c(tmp_path):
    """The exact Part-5 A2C run of multihost_worker.py, single-process
    (plain path: no mesh, device tables + chunked dispatch)."""
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.models import a2c, reward
    from image_captioning_through_rl_tpu.train.optim import adam

    cfg = NC(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8)
    fixture = make_synthetic_coco(str(tmp_path / "coco_a2c_ref"),
                                  num_train_images=8, num_val_images=4,
                                  vocab_size=30, feature_dim=16, seed=5)
    data = load_data(fixture)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    rparams = reward.init(jax.random.PRNGKey(1), cfg)
    tx = adam(1e-4, params, cfg.freeze_embeddings)
    out_dir = tmp_path / "a2c_ref"
    out_dir.mkdir()
    sp = [str(out_dir / "model.ckpt"), str(out_dir / "a2cNetwork.ckpt")]
    out = loops.a2c_training(
        data, params, rparams, tx, tx.init(params), cfg, None, sp,
        batch_size=8, epochs=1, seed=0, chunk_steps=2,
    )
    return [float(np.asarray(x, np.float64).sum())
            for x in jax.tree.leaves(jax.device_get(out))]


@pytest.mark.slow
def test_two_process_job_matches_single_process(tmp_path, monkeypatch):
    port = _free_port()
    nproc = 2
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_COORDINATOR_ADDRESS",
                        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "multihost_worker.py"),
             str(i), str(nproc), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(nproc)
    ]
    # drain all ranks concurrently (a full sibling pipe or a dead peer
    # would otherwise deadlock a sequential communicate loop), and kill
    # survivors before asserting so no orphan outlives a failure
    import threading

    drained = [None] * nproc

    def _drain(i, p):
        try:
            drained[i] = p.communicate(timeout=600)
        except Exception as e:  # timeout, decode error, ...
            drained[i] = ("", f"drain failed: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=_drain, args=(i, p))
               for i, p in enumerate(procs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=620)
    for p in procs:
        if p.poll() is None:
            p.kill()
    results = {}
    for p, res in zip(procs, drained):
        out, err = res if res is not None else ("", "worker never drained")
        assert p.returncode == 0 and res is not None, (
            f"worker failed:\nstdout:{out}\nstderr:{err}")
        rec = json.loads(out.strip().splitlines()[-1])
        results[rec["pid"]] = rec

    # both ranks computed identical global numbers (same SPMD program)
    assert results[0]["losses"] == pytest.approx(results[1]["losses"], rel=1e-6)
    assert results[0]["leafsums"] == pytest.approx(results[1]["leafsums"], rel=1e-6)

    # rank gating: only process 0 is main; only it wrote the checkpoint
    assert results[0]["is_main"] is True
    assert results[1]["is_main"] is False
    assert results[0]["ckpt_written"] is True
    assert results[1]["ckpt_written"] is False

    # 2-process run == single-process run (bare step losses)
    ref_losses = _single_process_reference()
    assert results[0]["losses"] == pytest.approx(ref_losses, rel=1e-5)

    # 2-process trainer == single-process trainer (final params)
    ref_sums = _single_process_trainer(tmp_path, monkeypatch)
    assert results[0]["leafsums"] == pytest.approx(ref_sums, rel=1e-4)

    # sharded eval: rank 0 wrote caption dumps, rank 1 wrote nothing,
    # and the captions equal the single-process (no-mesh) eval's
    assert results[0]["gen_captions"] and results[1]["gen_captions"] == ""
    ref_gen = _single_process_eval(tmp_path)
    assert results[0]["gen_captions"] == ref_gen

    # sync load: rank 1 has NO local checkpoint, yet both ranks resolve
    # to rank 0's weights (no divergent load-or-train branches)
    assert results[0]["sync_load_sum"] == pytest.approx(
        results[1]["sync_load_sum"], rel=1e-6)
    # Part 6: the --test_model path (load_a2c_models mesh=...) agrees
    # across ranks although only rank 0 holds the checkpoint files
    assert results[0]["test_model_sum"] == pytest.approx(
        results[1]["test_model_sum"], rel=1e-6)
    # Part 7: a 2-D (data x model) mesh across both processes — the
    # GlobalBatcher row-span dedupe case — matches the 1-D losses
    for r in results.values():
        assert r["losses_2d"] == pytest.approx(r["losses"], rel=1e-5)

    # flagship A2C training loop: both ranks agree, match the
    # single-process plain run, and only rank 0 saved the checkpoint
    assert results[0]["a2c_leafsums"] == pytest.approx(
        results[1]["a2c_leafsums"], rel=1e-6)
    ref_a2c = _single_process_a2c(tmp_path)
    assert results[0]["a2c_leafsums"] == pytest.approx(ref_a2c, rel=1e-4)
    assert results[0]["a2c_ckpt_written"] is True
    assert results[1]["a2c_ckpt_written"] is False

    # Part 8: exact resume across the mesh — only rank 0 holds the
    # trainstate (its bytes broadcast), and the 1-epoch+resume run
    # reproduces the uninterrupted 2-epoch run EXACTLY on both ranks
    for r in results.values():
        assert r["resume_resumed"] == r["resume_full"]
    assert results[0]["resume_full"] == results[1]["resume_full"]


def _single_process_eval(tmp_path):
    """The exact Part-3 eval of multihost_worker.py, single-process
    without a mesh."""
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.models import a2c

    fixture = make_synthetic_coco(str(tmp_path / "coco_eval"), num_train_images=8,
                                  num_val_images=4, vocab_size=30, feature_dim=16,
                                  seed=5)
    data = load_data(fixture)
    cfg = NC(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8, max_seq_len=6)
    params = a2c.init(jax.random.PRNGKey(4), cfg)
    out = tmp_path / "eval_ref"
    out.mkdir()
    paths = {
        "real_captions_path": str(out / "real.txt"),
        "generated_captions_path": str(out / "gen.txt"),
        "image_urls_path": str(out / "urls.txt"),
    }
    loops.test_a2c_network(
        params, cfg, data, paths, data_size=20, validation_batch_size=8,
        dcfg=DecodeConfig(beam_size=2, max_seq_len=6), seed=0,
        use_fused_kernel=False,
    )
    return open(paths["generated_captions_path"]).read()


def test_mesh_trainer_single_process_matches_plain(tmp_path, monkeypatch):
    """mesh= path on the suite's own 8-device mesh (single process): the
    GlobalBatcher/HostCocoTables route must reproduce the plain
    device-tables run exactly (same host RNG stream, same artifacts)."""
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco

    monkeypatch.setattr(
        loops, "_cfg_for",
        lambda d, b, nd=None: NC.for_vocab(d.word_to_idx, d.embeddings, bidirectional=b,
                                  input_dim=16, wordvec_dim=8, hidden_dim=8),
    )
    fixture = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=8,
                                  num_val_images=4, vocab_size=30, feature_dim=16,
                                  seed=5)
    data = load_data(fixture)

    paths_plain = {"policy_network": str(tmp_path / "plain.ckpt")}
    p_plain = loops.train_policy_network(
        data, paths_plain, None, False, epochs=1, batch_size=8, seed=3,
        chunk_steps=2,
    )
    paths_mesh = {"policy_network": str(tmp_path / "mesh.ckpt")}
    p_mesh = loops.train_policy_network(
        data, paths_mesh, None, False, epochs=1, batch_size=8, seed=3,
        chunk_steps=2, mesh=make_mesh((8,), ("data",)),
    )
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    assert os.path.exists(paths_mesh["policy_network"])


@pytest.mark.slow
def test_mesh_a2c_training_single_process(tmp_path, monkeypatch):
    """a2c_training(mesh=...) runs the chunked loop over the 8-device
    mesh and matches the plain run (same keys, same stats)."""
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.models import a2c, reward
    from image_captioning_through_rl_tpu.train.optim import adam

    cfg = NC(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8)
    fixture = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=8,
                                  num_val_images=4, vocab_size=30, feature_dim=16,
                                  seed=7)
    data = load_data(fixture)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    rparams = reward.init(jax.random.PRNGKey(1), cfg)
    tx = adam(1e-4, params, cfg.freeze_embeddings)

    def run(mesh, sub):
        sp = [str(tmp_path / sub / "model.ckpt"), str(tmp_path / sub / "a2c.ckpt")]
        (tmp_path / sub).mkdir()
        p = jax.tree.map(np.asarray, params)  # fresh copy (donated buffers)
        p = jax.tree.map(jnp.asarray, p)
        out = loops.a2c_training(
            data, p, rparams, tx, tx.init(p), cfg, None, sp,
            batch_size=8, epochs=1, seed=0, chunk_steps=2, mesh=mesh,
        )
        return jax.device_get(out)

    p_plain = run(None, "plain")
    p_mesh = run(make_mesh((8,), ("data",)), "mesh")
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    assert os.path.exists(str(tmp_path / "mesh" / "a2c.ckpt"))


def test_mesh_trainer_bidirectional_runs(tmp_path, monkeypatch):
    """Regression: --spmd + --bidirectional must not crash — the mesh
    branch used to build the (unidirectional-only) chunk step
    unconditionally; bidirectional configs take the non-chunked path."""
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco

    monkeypatch.setattr(
        loops, "_cfg_for",
        lambda d, b, nd=None: NC.for_vocab(d.word_to_idx, d.embeddings, bidirectional=b,
                                  input_dim=16, wordvec_dim=8, hidden_dim=8),
    )
    fixture = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=4,
                                  num_val_images=2, vocab_size=30, feature_dim=16,
                                  seed=5)
    data = load_data(fixture)
    mesh = make_mesh((8,), ("data",))

    p_paths = {"policy_network": str(tmp_path / "policy_bidi.ckpt")}
    loops.train_policy_network(
        data, p_paths, None, True, epochs=1, batch_size=8, seed=3, mesh=mesh)
    assert os.path.exists(p_paths["policy_network"])

    r_paths = {"reward_network": str(tmp_path / "reward_bidi.ckpt")}
    loops.train_reward_network(
        data, r_paths, None, True, epochs=1, batch_size=8, seed=3, mesh=mesh)
    assert os.path.exists(r_paths["reward_network"])


def test_mesh_eval_bidirectional_falls_back_to_xla(tmp_path):
    """Regression: sharded beam decode is unidirectional-only; a
    bidirectional eval with a mesh must fall back to the XLA beam
    instead of feeding bidi params to the unidirectional kernel."""
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.models import a2c

    fixture = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=4,
                                  num_val_images=3, vocab_size=30, feature_dim=16,
                                  seed=8)
    data = load_data(fixture)
    cfg = NC(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8,
             max_seq_len=6, bidirectional=True)
    params = a2c.init(jax.random.PRNGKey(2), cfg)
    paths = {
        "real_captions_path": str(tmp_path / "real.txt"),
        "generated_captions_path": str(tmp_path / "gen.txt"),
        "image_urls_path": str(tmp_path / "urls.txt"),
    }
    loops.test_a2c_network(
        params, cfg, data, paths, data_size=10, validation_batch_size=8,
        dcfg=DecodeConfig(beam_size=2, max_seq_len=6), seed=0,
        mesh=make_mesh((8,), ("data",)),
    )
    assert open(paths["generated_captions_path"]).read()


@pytest.mark.slow
def test_mesh_a2c_curriculum_single_process(tmp_path):
    """a2c_curriculum_training(mesh=...) — chunked dispatch with the
    on-device skip rule over the mesh — matches the plain run."""
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.models import a2c, reward
    from image_captioning_through_rl_tpu.train.optim import adam

    cfg = NC(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8)
    fixture = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=8,
                                  num_val_images=4, vocab_size=30, feature_dim=16,
                                  seed=7)
    data = load_data(fixture)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    rparams = reward.init(jax.random.PRNGKey(1), cfg)
    tx = adam(1e-4, params, cfg.freeze_embeddings)

    def run(mesh, sub):
        sp = [str(tmp_path / sub / "model.ckpt"), str(tmp_path / sub / "a2c.ckpt")]
        (tmp_path / sub).mkdir()
        p = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), params)
        out = loops.a2c_curriculum_training(
            data, p, rparams, tx, tx.init(p), cfg, None, sp,
            batch_size=8, epochs=1, curriculum=[3, 16], seed=0,
            chunk_steps=2, mesh=mesh,
        )
        return jax.device_get(out)

    p_plain = run(None, "plain")
    p_mesh = run(make_mesh((8,), ("data",)), "mesh")
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_mesh_value_trainer_single_process_matches_plain(tmp_path, monkeypatch):
    """train_value_network(mesh=...) — frozen-net loads via the synced
    path, host-RNG prefix draws, chunked dispatch — matches plain."""
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
    from image_captioning_through_rl_tpu.models import policy, reward
    from image_captioning_through_rl_tpu.train import checkpoint as ckpt

    cfg = NC(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8)
    monkeypatch.setattr(loops, "_cfg_for", lambda d, b, nd=None: cfg)
    fixture = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=8,
                                  num_val_images=4, vocab_size=30, feature_dim=16,
                                  seed=6)
    data = load_data(fixture)
    paths = {
        "policy_network": str(tmp_path / "policyNetwork.ckpt"),
        "reward_network": str(tmp_path / "rewardNetwork.ckpt"),
        "value_network": str(tmp_path / "value_plain.ckpt"),
    }
    ckpt.save_pytree(policy.init(jax.random.PRNGKey(0), cfg), paths["policy_network"])
    ckpt.save_pytree(reward.init(jax.random.PRNGKey(1), cfg), paths["reward_network"])

    p_plain = loops.train_value_network(
        data, paths, None, False, epochs=1, batch_size=8, seed=2, chunk_steps=2)
    paths_m = dict(paths, value_network=str(tmp_path / "value_mesh.ckpt"))
    p_mesh = loops.train_value_network(
        data, paths_m, None, False, epochs=1, batch_size=8, seed=2, chunk_steps=2,
        mesh=make_mesh((8,), ("data",)))
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_worker_failure_fails_fast_without_hang(tmp_path):
    """Failure injection: one rank dies before joining the job. The
    launcher must surface a clean error within the drain window and
    leave no orphan process (the concurrent-drain + kill path)."""
    import subprocess
    import threading
    import time

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_COORDINATOR_ADDRESS",
                        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")}
    # rank 0 = genuine worker (will block waiting for its peer);
    # rank 1 = immediate crasher
    good = subprocess.Popen(
        [sys.executable, os.path.join(_HERE, "multihost_worker.py"),
         "0", "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    bad = subprocess.Popen(
        [sys.executable, "-c", "import sys; sys.exit(3)"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)

    procs = [good, bad]
    drained = [None, None]

    def _drain(i, p, timeout):
        try:
            drained[i] = p.communicate(timeout=timeout)
        except Exception as e:
            drained[i] = ("", f"drain failed: {type(e).__name__}")

    t0 = time.time()
    threads = [threading.Thread(target=_drain, args=(i, p, 30))
               for i, p in enumerate(procs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=40)
    for p in procs:
        if p.poll() is None:
            p.kill()  # the launcher's survivor-cleanup step
    for p in procs:
        p.wait(timeout=10)
    assert time.time() - t0 < 90, "failure handling hung"
    assert bad.returncode == 3
    assert good.poll() is not None, "orphan rank survived the cleanup"
